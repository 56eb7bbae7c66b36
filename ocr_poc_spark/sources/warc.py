"""WARC source: read Common-Crawl-style WARC(.gz) archives straight
into the pages schema — the native input format of a web-scale crawl
(the reference ingests one uploaded binary per HTTP call,
/root/reference/api_server.py:123-126; a crawl pipeline ingests WARC
segments).

Scale shape: a .warc.gz file is gzip — NOT splittable — so the natural
unit of parallelism is the FILE, exactly how Common Crawl ships its
corpus (~64k files of ~1 GB per crawl): one task per file, thousands of
files in flight across the cluster. The reader is
`spark.read.format("binaryFile")` (whole-file rows, path + bytes)
followed by one Arrow-batched mapInPandas that decompresses and parses
records — executor memory must cover one file plus its decompressed
tail, the same envelope every CC processing stack (e.g. Spark +
warcio) budgets for. No external WARC library: the format is
line-oriented headers + Content-Length bodies, parsed here directly.

Only WARC-Type: response records with an http/https target URI become
pages; the HTTP response headers are stripped (payload begins after the
first CRLFCRLF) and ride along as `html` bytes. `text`/`lang` are
empty — extraction owns them downstream.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(raw: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, payload) for every response record of one
    (possibly multi-member-gzip) WARC byte string. Tolerant of trailing
    junk and of records missing Content-Length (skipped): a crawl
    pipeline must survive truncated segments, not crash the task."""
    if raw[:2] == b"\x1f\x8b":
        # gzip.decompress handles concatenated members (CC writes one
        # member per record).
        raw = gzip.decompress(raw)
    buf = io.BytesIO(raw)
    head_re = re.compile(rb"^WARC/\d+(\.\d+)?$")
    while True:
        # Seek the next record head. Matching the EXACT version line
        # ("WARC/1.0"), not a prefix: when a malformed record's body
        # could not be skipped (no usable Content-Length), this scan
        # walks body bytes — an archived page merely MENTIONING
        # "WARC/..." mid-prose must not desynchronize the parse.
        line = buf.readline()
        if not line:
            return
        if not head_re.match(line.strip()):
            continue
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            name, _, val = h.partition(b":")
            headers[name.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            continue  # unparseable record: skip, do not kill the task
        if length < 0:
            # A negative length would make read() consume to EOF and
            # silently drop every later record in the archive.
            continue
        content = buf.read(length)
        if (
            headers.get("warc-type") == "response"
            and headers.get("warc-target-uri", "").startswith(("http://", "https://"))
        ):
            # Response content = HTTP headers + CRLFCRLF + body.
            sep = content.find(_CRLF2)
            payload = content[sep + len(_CRLF2):] if sep >= 0 else content
            yield (
                headers["warc-target-uri"],
                headers.get("warc-date", ""),
                payload,
            )


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC(.gz) files under ``path`` -> the pages frame (url, warc_ts,
    html, text, lang). One binaryFile row per archive, one Arrow batch
    per record stream; downstream stages (extract_fused, run_job) see
    the exact schema the parquet source produces."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # One output frame PER FILE, not per Arrow batch: an Arrow batch
        # may group many whole-file rows, and buffering every archive's
        # decompressed payloads at once would hold (files-per-batch x
        # ~GB) in one worker — per-file yields bound peak memory to a
        # single archive.
        for pdf in batches:
            for raw in pdf["content"]:
                urls: list[str] = []
                ts: list = []
                html: list[bytes] = []
                for url, date, payload in parse_warc_bytes(bytes(raw)):
                    urls.append(url)
                    ts.append(pd.to_datetime(date, utc=True, errors="coerce"))
                    html.append(payload)
                yield pd.DataFrame(
                    {
                        "url": pd.Series(urls, dtype="object"),
                        "warc_ts": pd.Series(ts, dtype="datetime64[ns, UTC]"),
                        "html": pd.Series(html, dtype="object"),
                        "text": pd.Series([""] * len(urls), dtype="object"),
                        "lang": pd.Series([None] * len(urls), dtype="object"),
                    }
                )

    return files.mapInPandas(_parse, PAGES_SCHEMA)
