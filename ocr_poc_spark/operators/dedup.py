"""Deduplication operators for web-scale corpus curation.

All-native column expressions (zero Python in the hot path):

- exact duplicates     : groupBy full text (or sha2 digest at scale)
- n-gram Jaccard       : word-set similarity on bounded prefixes
- MinHash + LSH        : shingle -> 32 minhashes -> 8 banded signatures
                         -> bucket self-join -> candidate pairs
- SimHash              : 64-bit sign-aggregated word-hash fingerprint +
                         banded hamming-distance near-dup pairs

Scale notes: MinHash/SimHash avoid the O(n^2) pair explosion by joining
only within LSH bands / 16-bit simhash bands; the exact-jaccard verify
runs on candidates only. All shuffles key on the band signature, which
is uniform by construction (hash output) — no skew handling needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

NUM_MINHASHES = 32
NUM_BANDS = 8  # 4 hashes per band
SHINGLE_K = 3


def _words(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per duplicated text with keeper id + count."""
    return (
        df.groupBy(text_col)
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .select("keeper_id", "n_copies")
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Adds a `shingles` column: k-word n-grams (native HOF, no UDF)."""
    df = df.withColumn("_words", _words(text_col))
    expr = (
        f"transform(sequence(1, greatest(size(_words) - {k - 1}, 0)), "
        f"i -> concat_ws(' ', slice(_words, i, {k})))"
    )
    return df.withColumn("shingles", F.expr(expr)).drop("_words")


def minhash_signature(df: DataFrame, num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """Adds minhash_0..N-1 columns: min over shingles of xxhash64(shingle, seed)."""
    for j in range(num_hashes):
        df = df.withColumn(
            f"minhash_{j}",
            F.array_min(F.transform("shingles", lambda s, j=j: F.xxhash64(s, F.lit(j)))),
        )
    return df


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_MINHASHES,
    num_bands: int = NUM_BANDS,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) via MinHash banding, verified
    with exact shingle-set Jaccard on the candidates only."""
    rows_per_band = num_hashes // num_bands
    sig = minhash_signature(word_shingles(df.select(id_col, text_col), text_col), num_hashes)
    bands = []
    for b in range(num_bands):
        cols = [F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig")))
    sig = sig.select(
        F.col(id_col).alias("id"),
        F.col("shingles"),
        F.explode(F.array(*bands)).alias("bs"),
    ).select("id", "shingles", "bs.band", "bs.sig")

    left = sig.select(
        F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"), "band", "sig"
    )
    right = sig.select(
        F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"), "band", "sig"
    )
    cand = (
        left.join(right, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = F.array_distinct("sh_a")
    sb = F.array_distinct("sh_b")
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    prefix_words: int = 30,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard over bounded word prefixes, within groups
    (small-scale / oracle-checkable variant; MinHash is the scale path)."""
    base = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(group_col).alias("grp")] if group_col else [F.lit(1).alias("grp")] ),
        F.array_distinct(F.slice(_words(text_col), 1, prefix_words)).alias("ws"),
    )
    a = base.select(F.col("id").alias("id_a"), "grp", F.col("ws").alias("ws_a"))
    b = base.select(F.col("id").alias("id_b"), "grp", F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a.join(b, "grp")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: sign of per-bit sums of word hashes."""
    tok = df.select(id_col, F.explode(_words(text_col)).alias("w"))
    tok = tok.withColumn("h", F.xxhash64("w"))
    aggs = []
    for b in range(64):
        bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{b}"))
    per_doc = tok.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
    return per_doc.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band on each 16-bit quarter (a pair
    within hamming<=3 must agree exactly on at least one quarter), then
    verify bit_count(xor) on candidates."""
    s = simhash(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for q in range(4)
        ]
    )
    e = s.select("id", "simhash", F.explode(bands).alias("b")).select(
        "id", "simhash", "b.q", "b.key"
    )
    a = e.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "q", "key")
    bdf = e.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "q", "key")
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(bdf, ["q", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
