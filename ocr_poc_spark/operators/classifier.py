"""Supervised quality classifier (the GPT-3 / LLaMA "quality filtering"
stage): train a Naive Bayes model over hashed unigram+bigram features
on a POSITIVE corpus (curated text worth imitating) vs a NEGATIVE
corpus (typically the raw web crawl itself), then score every raw
document with its log-odds of being positive and keep high scorers —
plus a calibrated sliver of low scorers so the kept set is not a hard
cliff (the role the Pareto draw plays in GPT-3's published recipe).

This is the SUPERVISED sibling of dsir.importance_weights (which
reweights toward a target distribution without labels): same hashed
feature plumbing, different capability — a trained, persistable
classifier artifact with an explicit train/serve split.

Model = one row per hash bucket (a FULL spine of ``n_buckets`` rows, so
serving never meets an unseen bucket):

    llr(b)  = ln (c_pos[b]+a)/(t_pos+aB)  -  ln (c_neg[b]+a)/(t_neg+aB)
    prior   = ln n_pos_docs / n_neg_docs          (constant column)

    score(doc) = round(prior + sum_b c_doc[b] * llr(b), 4)
    keep       = score > 0
                 OR md5_bucket(id)/denom < exp(min(score, 0))

The acceptance arm is DETERMINISTIC (the md5 bucket of the id, the
same reproducible-uniform substitute for rand() the samplers use), so
re-runs, resumed partitions and the SQL oracle keep identical rows;
its probability e^score mirrors the published soft-acceptance intent
without an RNG. The acceptance threshold is floor-quantised to 1/denom
of the 4dp-ROUNDED score — exp() is libm (last-ulp risk, the same
documented margin contract as dsir/bigram_lm ln terms).

Plan (scales to 100 TB):
- training: two explode + groupBy(bucket) count passes (uniform hash
  keys, partial map-side combine) + tiny doc-count aggregates; the
  model is <= n_buckets rows, broadcast everywhere it is used.
- scoring: one explode, one (id, bucket) partial-combined groupBy, one
  broadcast join, one per-doc aggregate. Only (id, int, int) rows
  cross shuffles — never text. Identical shape to dsir scoring.

Reference parity: the reference is a per-document service with no
corpus-selection stage; this operator is LLM-pipeline-brief breadth
(quality classifier filtering, GPT-3 Appendix A / LLaMA's CCNet+LM
gate, public recipes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.texthash import hash60
from .dsir import DEFAULT_BUCKETS, _doc_buckets


def nb_train(
    pos: DataFrame,
    neg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """Train the hashed Naive Bayes quality model. Returns exactly
    ``n_buckets`` rows (bucket int, llr double, prior double) — the
    persistable classifier artifact (write it once, broadcast it into
    every serving job). prior is constant across rows; it rides the
    frame so one parquet is the whole model.

    Empty corpora fail loudly in-plan (an all-NULL llr column would
    silently score every document NULL downstream)."""
    if alpha <= 0:
        raise ValueError("alpha must be positive (zero breaks unseen buckets)")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    spark = pos.sparkSession

    def counts(frame: DataFrame, name: str) -> DataFrame:
        return (
            _doc_buckets(frame, id_col, text_col, n_buckets, keep_id=False)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # Each count table has two consumers (the model spine join and its
    # total) — the non-eager checkpoint tokenizes each class corpus
    # once instead of once per reference (<= n_buckets rows held).
    cp = counts(pos, "c_pos").localCheckpoint(eager=False)
    cn = counts(neg, "c_neg").localCheckpoint(eager=False)
    totals = (
        cp.agg(F.sum("c_pos").alias("t_pos"))
        .crossJoin(cn.agg(F.sum("c_neg").alias("t_neg")))
        .crossJoin(pos.agg(F.count(F.lit(1)).alias("n_pos")))
        .crossJoin(neg.agg(F.count(F.lit(1)).alias("n_neg")))
    )
    return _nb_model(spark, cp, cn, totals, n_buckets, alpha)


def _nb_model(
    spark, cp: DataFrame, cn: DataFrame, totals: DataFrame,
    n_buckets: int, alpha: float,
) -> DataFrame:
    """Model assembly shared by nb_train and the fused self-train path:
    full bucket spine joined with the class counts, llr/prior exprs.
    ONE definition so the two paths cannot drift."""

    def checked(col: str, side: str):
        return F.when(
            F.col(col).isNull() | (F.col(col) == 0),
            F.raise_error(
                F.lit(f"nb_train: {side} corpus has no n-grams/documents")
            ).cast("long"),
        ).otherwise(F.col(col))

    a, b = F.lit(float(alpha)), F.lit(float(n_buckets))
    # Full bucket spine: every bucket in [0, n_buckets) gets a row, so
    # serving needs no unseen-bucket arm (absent features still carry
    # the smoothed t_neg/t_pos offset, which is NOT zero).
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        spine.join(F.broadcast(cp), "bucket", "left")
        .join(F.broadcast(cn), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(F.coalesce("c_pos", F.lit(0)) + a)
                - F.log(checked("t_pos", "positive") + a * b)
                - F.log(F.coalesce("c_neg", F.lit(0)) + a)
                + F.log(checked("t_neg", "negative") + a * b)
            ).alias("llr"),
            (
                F.log(checked("n_pos", "positive"))
                - F.log(checked("n_neg", "negative"))
            ).alias("prior"),
        )
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    denom: int = 10000,
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Score documents under a trained model: (id, n_terms, score,
    keep). score = round(prior + sum c_doc*llr, 4), higher = more
    positive-like; keep = score > 0 OR the deterministic md5-uniform
    acceptance described in the module docstring. Documents with no
    features keep a row (score = prior alone, n_terms = 0) — dropping
    them silently would un-count empty docs from every downstream
    keep-rate.

    ``n_buckets`` must match training; a mismatch surfaces as missing
    model rows and fails loudly in-plan rather than silently dropping
    feature mass.

    ``doc_counts``: pass precomputed per-document (id, bucket, c_doc)
    rows to skip the tokenize+hash pass — the fused self-train path
    (nb_train_score_self) computes them once for training AND scoring."""
    if doc_counts is None:
        doc_counts = (
            _doc_buckets(df, id_col, text_col, n_buckets, keep_id=True)
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("c_doc"))
        )
    feats = (
        doc_counts.join(F.broadcast(model), "bucket", "left")
        .withColumn(
            "llr",
            F.when(
                F.col("llr").isNull(),
                F.raise_error(
                    F.lit(
                        "nb_score: feature bucket missing from model "
                        "(n_buckets mismatch between train and serve?)"
                    )
                ).cast("double"),
            ).otherwise(F.col("llr")),
        )
    )
    per_doc = feats.groupBy(id_col).agg(
        F.sum("c_doc").cast("long").alias("n_terms"),
        F.round(F.first("prior") + F.sum(F.col("c_doc") * F.col("llr")), 4).alias(
            "score"
        ),
    )
    # Feature-less docs (empty/NULL text: no unigrams survive the
    # '' filter and no bigram window exists) come back via a constant
    # union branch scored at the bare prior — the decontaminate
    # pattern, cheaper than LEFT-joining the whole corpus back.
    prior_row = F.broadcast(model.agg(F.first("prior").alias("_prior0")))
    empty = (
        df.where(F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "")
        .crossJoin(prior_row)
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_terms"),
            F.round(F.col("_prior0"), 4).alias("score"),
        )
    )
    scored = per_doc.unionByName(empty)
    u = F.pmod(hash60(id_col), F.lit(denom))
    thresh = F.floor(
        F.exp(F.least(F.col("score"), F.lit(0.0))) * F.lit(float(denom))
    )
    return scored.withColumn(
        "keep", (F.col("score") > 0) | (u < thresh)
    )


def nb_train_score_self(
    df: DataFrame,
    pos_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.5,
    denom: int = 10000,
) -> DataFrame:
    """Fused train+score for the self-training shape (the negative
    class is the corpus itself minus the positives — the GPT-3 recipe,
    and the driver's quality_classifier query): ONE tokenize+hash pass
    over the corpus instead of three (pos counts, neg counts, scoring).

    ``pos_pred``: boolean Column marking the positive class; rows where
    it is false OR NULL are the negative class — exactly the
    pos/neg partition ``df.where(p)`` / ``df.where(~p | p.isNull())``
    produces, so results are identical to
    ``nb_score(df, nb_train(df.where(p), df.where(~p | isnull(p))))``
    (every count is the same exact integer; the model assembly and
    scoring expressions are the shared _nb_model / nb_score code).

    The per-document bucket counts are materialized once and reused by
    the class count aggregation AND scoring — the same (id, int, int)
    rows that already cross the groupBy shuffle, never text."""
    spark = df.sparkSession
    flagged = df.withColumn("_pos", pos_pred.eqNullSafe(F.lit(True)))
    doc_counts = (
        _doc_buckets(
            flagged, id_col, text_col, n_buckets, keep_id=True,
            extra_cols=("_pos",),
        )
        .groupBy(id_col, "_pos", "bucket")
        .agg(F.count(F.lit(1)).alias("c_doc"))
        .localCheckpoint(eager=True)
    )
    # Two consumers each (totals + model join): fence so the per-class
    # re-aggregation of the checkpointed doc counts runs once.
    cp = (
        doc_counts.where(F.col("_pos"))
        .groupBy("bucket").agg(F.sum("c_doc").alias("c_pos"))
        .localCheckpoint(eager=False)
    )
    cn = (
        doc_counts.where(~F.col("_pos"))
        .groupBy("bucket").agg(F.sum("c_doc").alias("c_neg"))
        .localCheckpoint(eager=False)
    )
    # Document totals count EVERY row (feature-less docs included), so
    # they come from the corpus frame, not the feature rows — a cheap
    # pruned scan of the predicate columns only.
    totals = (
        cp.agg(F.sum("c_pos").alias("t_pos"))
        .crossJoin(cn.agg(F.sum("c_neg").alias("t_neg")))
        .crossJoin(
            flagged.agg(
                F.count(F.when(F.col("_pos"), 1)).alias("n_pos"),
                F.count(F.when(~F.col("_pos"), 1)).alias("n_neg"),
            )
        )
    )
    model = _nb_model(spark, cp, cn, totals, n_buckets, alpha)
    return nb_score(
        df, model, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        denom=denom,
        doc_counts=doc_counts.select(id_col, "bucket", "c_doc"),
    )
