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
records. Decompression is STREAMED (gzip.GzipFile over the in-memory
member chain — never a whole-archive decompress()) and records are
yielded in bounded-size pandas batches, so peak task memory is the
compressed file + one decompression window + one output batch — the
"one file plus tail" envelope every CC processing stack (e.g. Spark +
warcio) budgets for, NOT 1x compressed + 2x decompressed (ADVICE r4).
No external WARC library: the format is line-oriented headers +
Content-Length bodies, parsed here directly.

Only WARC-Type: response records with an http/https target URI become
pages; the HTTP response headers are stripped (payload begins after the
first CRLFCRLF) and ride along as `html` bytes. `text`/`lang` are
empty — extraction owns them downstream.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import IO, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"

# Records per yielded pandas batch in read_warc_pages. ~1k html payloads
# of CC-typical size is a few tens of MB per batch — small against the
# executor heap, large enough that Arrow transfer overhead stays
# negligible (one batch per ~1k rows, not per row).
WARC_BATCH_RECORDS = 1024


def parse_warc_stream(buf: IO[bytes]) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, payload) for every response record read
    incrementally from a file-like of UNCOMPRESSED WARC bytes. Tolerant
    of trailing junk and of records missing Content-Length (skipped): a
    crawl pipeline must survive truncated segments, not crash the
    task."""
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


def parse_warc_bytes(raw: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, payload) for every response record of one
    (possibly multi-member-gzip) WARC byte string. Gzip input is
    decompressed INCREMENTALLY (gzip.GzipFile reads concatenated
    members transparently — CC writes one member per record), so only
    the current record's window is resident, never the whole
    decompressed archive."""
    buf: IO[bytes]
    if raw[:2] == b"\x1f\x8b":
        buf = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        buf = io.BytesIO(raw)
    yield from parse_warc_stream(buf)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC(.gz) files under ``path`` -> the pages frame (url, warc_ts,
    html, text, lang). One binaryFile row per archive; records stream
    out in bounded pandas batches (WARC_BATCH_RECORDS rows), so a 1 GB
    archive never materializes as one giant frame; downstream stages
    (extract_fused, run_job) see the exact schema the parquet source
    produces."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _flush(urls, ts, html) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(ts, dtype="datetime64[ns, UTC]"),
                "html": pd.Series(html, dtype="object"),
                "text": pd.Series([""] * len(urls), dtype="object"),
                "lang": pd.Series([None] * len(urls), dtype="object"),
            }
        )

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # Bounded output batches: an Arrow input batch may group many
        # whole-file rows, and buffering even ONE archive's payloads in
        # a single frame holds ~the decompressed archive in one worker.
        # Flushing every WARC_BATCH_RECORDS records caps the resident
        # set at compressed-file + decompression window + one batch.
        # An empty-archive file still yields one empty frame (schema
        # witness), matching the previous per-file contract.
        for pdf in batches:
            for raw in pdf["content"]:
                urls: list[str] = []
                ts: list = []
                html: list[bytes] = []
                any_yield = False
                for url, date, payload in parse_warc_bytes(bytes(raw)):
                    urls.append(url)
                    ts.append(pd.to_datetime(date, utc=True, errors="coerce"))
                    html.append(payload)
                    if len(urls) >= WARC_BATCH_RECORDS:
                        yield _flush(urls, ts, html)
                        any_yield = True
                        urls, ts, html = [], [], []
                if urls or not any_yield:
                    yield _flush(urls, ts, html)

    return files.mapInPandas(_parse, PAGES_SCHEMA)
