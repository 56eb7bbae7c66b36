"""Per-partition lineage/metrics (S5/A4) — the service-counter analogue.

The reference keeps module-global request/success/error counters and a
CSV metrics log (/root/reference/api_server.py:54-58,79,90). In a
distributed job those become per-partition metric rows emitted by a
``mapInPandas`` pass over the extracted output — one row per Spark
partition with doc/ok/failed counts and wall seconds, appended to a
lineage table keyed by run_id.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..schemas import LINEAGE_SCHEMA


def partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """extracted (with success + bucket cols) -> lineage rows, one per
    (bucket, partition). Only (bucket, success) are shipped through
    Arrow — column pruning keeps this pass cheap."""

    def _metrics(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        counts: dict[int, list[int]] = {}
        for pdf in batches:
            for bucket, ok in zip(pdf["bucket"], pdf["success"]):
                c = counts.setdefault(int(bucket), [0, 0, 0])
                c[0] += 1
                if bool(ok):
                    c[1] += 1
                else:
                    c[2] += 1
        secs = time.monotonic() - t0
        if counts:
            yield pd.DataFrame(
                {
                    "run_id": [run_id] * len(counts),
                    "bucket": list(counts),
                    "partition_id": [pid] * len(counts),
                    "n_docs": [c[0] for c in counts.values()],
                    "n_ok": [c[1] for c in counts.values()],
                    "n_failed": [c[2] for c in counts.values()],
                    "secs": [secs] * len(counts),
                    "status": ["SUCCESS"] * len(counts),
                }
            )

    return extracted.select("bucket", "success").mapInPandas(_metrics, LINEAGE_SCHEMA)
