"""Geometric join operators from the reference's notebook prototypes.

- J3 zone-containment join (main.ipynb cell 2, CNIExtractorTemplateMatching
  .extract_from_zone): template zones (per-field x/y ranges) joined to
  blocks whose centroid falls inside the zone, scored by distance to the
  zone centre. Spark executes the containment predicate as a broadcast
  nested-loop join — fine because the zone table is tiny and broadcast.
- J4 directional band join (main.ipynb cell 0, find_value_by_proximity):
  value candidates strictly right of an anchor within a vertical band
  (1.5x anchor height) or below within 3x, same-line-right boosted 1.5x.
- A5 document-bounds aggregate (main.ipynb cell 2 find_document_bounds):
  min/max x/y per document — computed with higher-order functions on the
  block array, i.e. zero shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def zone_containment_join(
    blocks: DataFrame,
    zones: DataFrame,
    doc_col: str = "url",
    top_1: bool = True,
) -> DataFrame:
    """blocks(doc, idx, text, x, y) x zones(field, x1, x2, y1, y2)
    -> candidate (doc, field, idx, text, dist_score); top-1 per
    (doc, field) when top_1 (ref: min distance-to-zone-centre)."""
    j = blocks.join(
        F.broadcast(zones),
        (blocks["x"] >= zones["x1"]) & (blocks["x"] <= zones["x2"])
        & (blocks["y"] >= zones["y1"]) & (blocks["y"] <= zones["y2"]),
    )
    cx = (F.col("x1") + F.col("x2")) / 2
    cy = (F.col("y1") + F.col("y2")) / 2
    dist = F.sqrt((F.col("x") - cx) ** 2 + (F.col("y") - cy) ** 2)
    out = j.select(doc_col, "field", "idx", "text", dist.alias("dist"))
    if not top_1:
        return out
    w = Window.partitionBy(doc_col, "field").orderBy(F.asc("dist"), F.asc("idx"))
    return out.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")


def band_join(
    anchors: DataFrame,
    values: DataFrame,
    doc_col: str = "url",
    anchor_h: float = 20.0,
) -> DataFrame:
    """Directional window binding (J4): per anchor, candidates right of
    it within 1.5*h vertically, or below within 3*h; same-line-right
    score boosted 1.5x; best per anchor by boosted score then idx."""
    a = anchors.select(
        F.col(doc_col).alias("_doc"), F.col("field"),
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("idx").alias("a_idx"),
    )
    v = values.select(
        F.col(doc_col).alias("_doc"), F.col("idx").alias("v_idx"),
        F.col("text").alias("value"), F.col("score").alias("v_score"),
        F.col("x").alias("vx"), F.col("y").alias("vy"),
    )
    right_of = (F.col("vx") > F.col("ax")) & (
        F.abs(F.col("vy") - F.col("ay")) <= 1.5 * anchor_h
    )
    below = (F.col("vy") > F.col("ay")) & (
        (F.col("vy") - F.col("ay")) <= 3.0 * anchor_h
    )
    j = a.join(v, "_doc").where(
        (F.col("v_idx") != F.col("a_idx")) & (right_of | below)
    )
    boosted = F.when(right_of, F.col("v_score") * 1.5).otherwise(F.col("v_score"))
    w = Window.partitionBy("_doc", "field").orderBy(
        F.desc("boosted"), F.asc("v_idx")
    )
    return (
        j.withColumn("boosted", boosted)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(F.col("_doc").alias(doc_col), "field", "value", "boosted")
    )


def doc_bounds(parsed: DataFrame) -> DataFrame:
    """A5: per-document min/max x/y over the block array — higher-order
    functions only, no explode, no shuffle."""
    xs = F.transform("blocks", lambda b: b["x"])
    ys = F.transform("blocks", lambda b: b["y"])
    return parsed.where(F.size("blocks") > 0).select(
        "url",
        F.array_min(xs).alias("min_x"),
        F.array_max(xs).alias("max_x"),
        F.array_min(ys).alias("min_y"),
        F.array_max(ys).alias("max_y"),
    )
