"""Keyword retrieval over the document corpus: BM25 scoring + top-k —
the lookup-side counterpart of the curation suite (a training-data
pipeline constantly greps its corpus: find documents about X, audit
what the dedup kept, pull eval-adjacent docs). Pure DataFrame ops, no
UDF; exactly recomputable in SQL (the lm_perplexity float discipline:
integer tf/df witnesses, log-based scores on a 4-decimal rounding
margin).

Scale shape: the query is a handful of terms — it rides as a broadcast
literal set. One explode + per-(doc, term) count with map-side partial
aggregation, document frequencies for ONLY the query terms (tiny
aggregate), one broadcast join back, one TakeOrderedAndProject top-k.
No inverted index is materialized on the direct path; `bm25_index` is
the persisted query-many form (same index-once/query-many pattern as
minhash_band_index).

Reference parity: the reference exposes no retrieval endpoint (its
lookups are per-document field extraction, /root/reference/
api_server.py); BM25 here is LLM-pipeline breadth — the corpus-audit
capability the brief's training-data pipeline needs. Okapi BM25 with
the Lucene (+1-inside-the-log) idf is public textbook material.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.texthash import norm_words


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    index: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-k: score = sum over distinct query terms of
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen)), with
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1) (the non-negative
    Lucene form). Determinism: the top-k orders by (round(score, 4)
    desc, id asc) — both engines rank on the ROUNDED score, so libm
    ulp noise cannot flip the cut (same 4-decimal-margin discipline as
    bigram_lm_scores). Returns (id, n_hit_terms, score); consumers
    recover rank from (score desc, id asc) — no rank column, because
    producing one would need a global window, and the suite's plan
    discipline keeps global top-k on TakeOrderedAndProject (per-
    partition heaps + driver merge), never a single-partition window.

    Documents matching no query term are not returned; a blank query
    raises.

    SERVING MODE: pass ``index`` (the persisted bm25_index frame) to
    answer the query from the inverted file without touching document
    text — corpus stats (N, avg length) come from the index's distinct
    (id, dl) pairs. ``n_docs`` overrides N for corpora whose empty
    documents were dropped from the index but should still count."""
    terms = sorted({w for w in query.lower().strip().split() if w})
    if not terms:
        raise ValueError("bm25_topk: query has no terms")

    term_lit = F.array(*[F.lit(t) for t in terms])
    if index is not None:
        docs = index.select(F.col(id_col).alias("_id"), "dl").distinct()
        stats = docs.agg(
            (F.lit(n_docs) if n_docs is not None else F.count(F.lit(1))).alias("n_docs"),
            F.avg("dl").alias("avg_len"),
        )
        tf = index.where(F.array_contains(term_lit, F.col("term"))).select(
            F.col(id_col).alias("_id"), "dl", F.col("term").alias("t"), "tf"
        )
    else:
        words = df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(norm_words(F.coalesce(F.col(text_col), F.lit(""))), F.array()).alias("_w"),
        )
        stats = words.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.size("_w")).alias("avg_len"),
        )
        tf = (
            words.select("_id", F.size("_w").alias("dl"), F.explode("_w").alias("t"))
            .where(F.array_contains(term_lit, F.col("t")))
            .groupBy("_id", "dl", "t")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "t").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avg_len"))
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum(idf * tf_part).alias("_s"),
    )
    return (
        per_doc.select(
            F.col("_id").alias(id_col),
            "n_hit_terms",
            F.round("_s", 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )


def bm25_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The persistable BM25 inverted file: (term, id, tf, dl) — one row
    per (document, distinct term), plus document length. Write once per
    corpus snapshot; bm25_topk(..., index=) then serves any query from
    it without re-tokenizing the corpus — the same index-once/query-many
    shape as minhash_band_index and the IVF serving mode. Terms and
    counts only, never document text."""
    words = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(norm_words(F.coalesce(F.col(text_col), F.lit(""))), F.array()).alias("_w"),
    )
    return (
        words.select("_id", F.size("_w").alias("dl"), F.explode("_w").alias("t"))
        .where(F.col("t") != "")
        .groupBy("_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(F.col("t").alias("term"), F.col("_id").alias(id_col), "tf", "dl")
    )
