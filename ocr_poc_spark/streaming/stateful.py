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
