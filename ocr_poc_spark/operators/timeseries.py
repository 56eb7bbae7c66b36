"""Time-series operators over event streams.

`asof_join` — backward as-of join: attach to every left event the
right-side row with the greatest timestamp <= the left timestamp for
the same key ("the latest known state at event time": last page view
before a click, last price quote before a trade, last sensor reading
before an alert). The canonical time-series join kv-stores and
kdb/pandas (`merge_asof`) ship natively and Spark does not.

Spark-first formulation: the naive theta-join (r.ts <= l.ts, then pick
the max) explodes to |L|x|R| rows per key before pruning. Instead, tag
both sides, UNION them, and carry the latest right payload forward
with last(ignorenulls) over ONE (key, time)-ordered window:

    cost  = one hash exchange on the key + one sort   (no join at all)
    output = exactly |L| rows

Scale notes (100 TB): the window is partitioned by the join key, so
state per task is one carried payload struct — constant memory, no
WindowExec buffering beyond the sort. A zipf-hot key concentrates its
events in one partition's SORT (not a cross product); if one key's
history exceeds a task, pre-bucket time ranges and seed each bucket
with the previous bucket's closing state (the standard watermark
chunking; not needed below ~10^8 events per key). Rows, not vectors,
ride the shuffle.

Reference parity: the reference has no temporal joins (stateless
per-document service); this operator is LLM-pipeline/event-analytics
breadth (SURVEY §2.4 join family), sibling of the zone/band/range
joins in operators/zones.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row: the nearest right row at-or-before its ts
    (direction="backward", the default: greatest right ts <= left.ts)
    or at-or-after it (direction="forward": smallest right ts >=
    left.ts), sharing the key(s) `on` — both inclusive at equal
    instants, pandas merge_asof's contract. Returns all left columns
    plus `<ts_col><suffix>` and each requested right column as
    `<col><suffix>` (NULL where no right row qualifies).

    ``right_cols`` defaults to every right column except the keys and
    the timestamp. ``tie_col``: when the right side can hold several
    rows at the same (key, ts), the one with the maximum tie_col wins
    deterministically (they are collapsed BEFORE the window — the
    window ordering alone would pick an arbitrary survivor). Left rows
    with NULL timestamps match nothing. ``tolerance``: maximum allowed
    |left.ts - match.ts| — SECONDS for timestamp columns, same units
    as the column for numerics (both compare via a double cast);
    matches farther away are nulled, not replaced by the next nearest
    (merge_asof semantics). The forward window is the same one-
    exchange carry-forward scan in reverse time order."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError("asof_join: tolerance must be non-negative")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    # A NULL-timestamped right row has no position on the timeline —
    # under nulls-first ordering it would be "carried" into every real
    # row as the oldest state. A NULL-KEY right row must go too: the
    # window's partitionBy groups NULLs together (unlike an equi-join,
    # where NULL matches nothing), which would hand NULL-key left rows
    # a match that merge_asof / ASOF JOIN semantics forbid. The tie
    # column must survive this projection even when the caller doesn't
    # want it in the output (the max_by collapse reads it).
    proj = list(right_cols)
    if tie_col is not None and tie_col not in proj and tie_col != ts_col:
        proj.append(tie_col)
    key_ok = F.lit(True)
    for k in keys:
        key_ok = key_ok & F.col(k).isNotNull()
    r = right.select(*keys, ts_col, *proj).where(
        F.col(ts_col).isNotNull() & key_ok
    )
    if tie_col is not None:
        r = r.groupBy(*keys, ts_col).agg(
            *[
                F.expr(f"max_by({c}, {tie_col})").alias(c)
                for c in right_cols
            ]
        )
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    r_tagged = r.select(
        *keys,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        *keys,
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # Equal timestamps: right (_side 0) sorts before left (_side 1), so
    # a same-instant right row IS visible to the left row — backward-
    # INCLUSIVE, matching DuckDB/pandas asof semantics.
    t_order = F.asc("_t") if direction == "backward" else F.desc("_t")
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL-ts LEFT rows are preserved with a NULL match (left-join
    # semantics); the when() guard stops them from reading whatever the
    # nulls-first sort happened to place before them.
    carried = F.when(
        F.col("_t").isNotNull(), F.last("_p", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        # timestamp columns measure in exact integer microseconds
        # (TIMESTAMP_NTZ cannot cast to double directly); numerics in
        # their own units via double.
        is_ts = r_tagged.schema["_t"].dataType.typeName().startswith("timestamp")

        def _axis(c):
            return (
                F.unix_micros(c.cast("timestamp"))
                if is_ts
                else c.cast("double")
            )

        bound = float(tolerance) * (1_000_000 if is_ts else 1)
        dist = F.abs(
            _axis(F.col("_t")) - _axis(carried.getField(f"{ts_col}{suffix}"))
        )
        carried = F.when(dist <= F.lit(bound), carried)
    out = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_carried", carried)
        .where(F.col("_side") == 1)
    )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col(f"_carried.{ts_col}{suffix}").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_carried.{c}{suffix}").alias(f"{c}{suffix}")
          for c in right_cols],
    )
