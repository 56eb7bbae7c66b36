"""Custom stateful streaming operator: running per-language ingest
totals across micro-batches via ``applyInPandasWithState``.

The reference's module-global service counters
(/root/reference/api_server.py:54-58) reset on process restart; the
streaming analogue keeps exact running totals in Spark state, surviving
micro-batch boundaries and (with a checkpoint) restarts. Demonstrates
the applyInPandasWithState surface for operators that genuinely need
cross-batch state (the extraction itself is stateless per document).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("batch_docs", T.LongType()),
        T.StructField("batch_bytes", T.LongType()),
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    batch_docs = 0
    batch_bytes = 0
    for pdf in pdfs:
        batch_docs += len(pdf)
        batch_bytes += int(pdf["n_bytes"].sum())
    total_docs, total_bytes = state.get if state.exists else (0, 0)
    total_docs += batch_docs
    total_bytes += batch_bytes
    state.update((total_docs, total_bytes))
    yield pd.DataFrame(
        {
            "lang": [key[0]],
            "batch_docs": [batch_docs],
            "batch_bytes": [batch_bytes],
            "total_docs": [total_docs],
            "total_bytes": [total_bytes],
        }
    )


def running_ingest_totals(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> one row per (lang, micro-batch) with exact running
    totals held in Spark state."""
    import pyspark.sql.functions as F

    sized = pages_stream.select(
        "lang", F.length("html").cast("long").alias("n_bytes")
    )
    return sized.groupBy("lang").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming SimHash near-dup pairs: per-band-bucket state of every
# (id, fingerprint) seen so far; each arriving document is verified
# (exact hamming on the FULL 60-bit fingerprint) against its bucket's
# history, so a near-duplicate of ANY earlier micro-batch is caught —
# the cross-batch leg of operators/dedup.simhash_near_pairs, with the
# same pigeonhole recall guarantee (a pair within the radius agrees on
# >= 1 band, and that band's bucket holds both).
# --------------------------------------------------------------------------
PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.StringType()),
        T.StructField("id_b", T.StringType()),
    ]
)
BAND_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.StringType())),
        T.StructField("fps", T.ArrayType(T.LongType())),
    ]
)


def make_band_pairs_update(max_hamming: int, max_state_per_bucket: int | None = None):
    """Factory (never capture a loop/param var in a shared lambda): the
    per-bucket update comparing new rows against bucket history + earlier
    rows of the same batch, in sorted-id order (deterministic).

    STATE CONTRACT: with ``max_state_per_bucket=None`` a bucket's
    (id, fingerprint) history grows without bound and each arrival scans
    it linearly — correct and intended for availableNow replays of a
    bounded backlog, but a LONG-RUNNING stream on a skewed bucket
    degrades linearly with no eviction. Passing a cap keeps only the
    most recent N entries per bucket (arrival order): state and
    per-arrival work become O(N), at the explicit cost of RECALL — a
    pair whose two members are separated by more than N same-bucket
    arrivals is never emitted. Batch parity (stream == batch union)
    holds only uncapped."""

    def _update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            ids, fps = state.get
            ids, fps = list(ids), list(fps)
        else:
            ids, fps = [], []
        rows: list[tuple[str, int]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["id"], pdf["simhash"]))
        rows.sort(key=lambda t: t[0])
        out_a: list[str] = []
        out_b: list[str] = []
        for rid, fp in rows:
            fp = int(fp)
            for oid, ofp in zip(ids, fps):
                if oid != rid and bin(fp ^ ofp).count("1") <= max_hamming:
                    a, b = (rid, oid) if rid < oid else (oid, rid)
                    out_a.append(a)
                    out_b.append(b)
            ids.append(rid)
            fps.append(fp)
        if max_state_per_bucket is not None and len(ids) > max_state_per_bucket:
            ids = ids[-max_state_per_bucket:]
            fps = fps[-max_state_per_bucket:]
        state.update((ids, fps))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return _update
