"""Parse stage (S2/S3): binary payload -> positioned block array.

The reference's tokenizer boundary (PaddleOCR native inference,
/root/reference/ocr/paddle_extractor.py:21-34, batched iterator :49-57)
becomes ONE Arrow-batched ``mapInPandas`` stage: HTML DOM walk / PDF
text-object parse per payload, batch iteration inside the UDF (no
per-row Python at the Spark level). Output is the per-document block
array plus the doc_kind dispatch key; ``explode_blocks`` flattens to the
block stream consumed by the relational cascade.

Scale notes:
- narrow transformation: no shuffle; parallelism = input splits.
- column pruning: only (url, html) are read from the scan.
- Arrow batch size bounded via spark.sql.execution.arrow.maxRecordsPerBatch
  so a batch of html blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..extractor import sniff_and_parse
from ..schemas import PARSED_SCHEMA


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        payloads = pdf["html"].tolist()
        out_kind: list[str] = []
        out_blocks: list[list[dict]] = []
        for payload in payloads:
            try:
                blocks, kind = sniff_and_parse(
                    bytes(payload) if payload is not None else b""
                )
            except Exception as e:
                # Poison-pill isolation (same typed contract as the kernel,
                # extractor.extract_document): the cascade turns
                # doc_kind='error/<ExcType>' + zero blocks into a
                # success=false row with message 'internal_error: <ExcType>'.
                blocks, kind = [], f"error/{type(e).__name__}"
            out_kind.append(kind)
            out_blocks.append(
                [
                    {
                        "idx": b.idx,
                        "tag_path": b.tag_path,
                        "text": b.text,
                        "depth": b.depth,
                        "char_offset": b.char_offset,
                        "n_chars": b.n_chars,
                        "link_density": b.link_density,
                        "score": b.score,
                        "x": b.x,
                        "y": b.y,
                        "boiler": b.boiler,
                    }
                    for b in blocks
                ]
            )
        yield pd.DataFrame({"url": urls, "doc_kind": out_kind, "blocks": out_blocks})


def parse_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> parsed(url, doc_kind, blocks)."""
    return pages.select("url", "html").mapInPandas(_parse_batches, PARSED_SCHEMA)


def explode_blocks(parsed: DataFrame) -> DataFrame:
    """parsed -> block stream (url, doc_kind, idx, text, score, x, y, ...).

    posexplode is unnecessary: idx is already carried inside the struct.
    Narrow op — no shuffle.
    """
    b = parsed.select("url", "doc_kind", F.explode("blocks").alias("b"))
    return b.select("url", "doc_kind", "b.*")
