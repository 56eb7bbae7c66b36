"""Deduplication operators for web-scale corpus curation.

All-native column expressions (zero Python in the hot path):

- exact duplicates     : groupBy full text (or sha2 digest at scale)
- n-gram Jaccard       : word-set similarity on bounded prefixes
- MinHash + LSH        : shingle -> 32 minhashes -> 8 banded signatures
                         -> bucket self-join -> candidate pairs
- SimHash              : 60-bit sign-aggregated word-hash fingerprint +
                         banded hamming-distance near-dup pairs with
                         pigeonhole-exact recall (max_hamming+1 bands)

Scale notes: MinHash/SimHash avoid the O(n^2) pair explosion by joining
only within LSH / simhash bands; only ids ride the band shuffles (the
shingle arrays / fingerprints are joined back per deduped candidate
pair) and the exact verify runs on candidates only. All shuffles key on
the band signature, which is uniform by construction (hash output) — no
skew handling needed.
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
    """Exact dedup: one row per duplicated text with keeper id + count.

    Groups on the sha2-256 digest, not the text itself: at 100TB the
    shuffle then carries 64 hex chars per document instead of the
    document body (collision probability is negligible at any corpus
    size; a paranoid caller can re-verify within groups)."""
    return (
        df.select(id_col, F.sha2(F.col(text_col), 256).alias("_digest"))
        .groupBy("_digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .select("keeper_id", "n_copies")
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Adds a `shingles` column: k-word n-grams (native HOF, no UDF).

    Documents with fewer than k words get an EMPTY shingle array — the
    naive `sequence(1, greatest(size-k+1, 0))` is a trap: for short docs
    it evaluates to sequence(1, 0) = [1, 0] (descending) and slice(_, 0,
    k) throws at runtime, poison-pilling the whole dedup job."""
    df = df.withColumn("_words", _words(text_col))
    expr = (
        f"CASE WHEN size(_words) >= {k} THEN "
        f"transform(sequence(1, size(_words) - {k - 1}), "
        f"i -> concat_ws(' ', slice(_words, i, {k}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return df.withColumn("shingles", F.expr(expr)).drop("_words")


def minhash_signature(df: DataFrame, num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """Adds minhash_0..N-1 columns: min over shingles of xxhash64(shingle, seed).

    NB the seed must be closed over via a factory function: a two-arg
    lambda (`lambda s, j=j: ...`) is interpreted by F.transform as
    (element, index) and the array INDEX silently overrides the seed —
    degenerating all N hashes to one identical function (found by the
    DuckDB exact-Jaccard oracle: a 0.989-Jaccard pair missed 32/32)."""

    def _mh(j: int):
        return F.array_min(
            F.transform("shingles", lambda s: F.xxhash64(s, F.lit(j)))
        )

    for j in range(num_hashes):
        df = df.withColumn(f"minhash_{j}", _mh(j))
    return df


def _shingle_and_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    num_bands: int,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(shingled(id, shingles), band_ids(id, band, sig)) — the shared
    front half of the batch and incremental MinHash paths.

    ``materialize``: callers that consume BOTH frames more than once
    (minhash_lsh_pairs references shingled on each verify side and
    band_ids on each side of the band self-join) pass True so the
    tokenize+shingle pass runs ONCE and the num_hashes-fold signature
    pass runs ONCE — without it the physical plan scans and re-shingles
    the corpus once per reference (4 scans + 2 signature passes,
    measured in plans/r06/dedup_minhash_before.txt). Same
    materialization contract as simhash_near_pairs: localCheckpoint is
    fine up to very large corpora; at 10^12 docs persist the two frames
    as intermediate tables instead."""
    rows_per_band = num_hashes // num_bands
    shingled = word_shingles(df.select(id_col, text_col), text_col).select(
        F.col(id_col).alias("id"), "shingles"
    )
    if materialize:
        shingled = shingled.localCheckpoint(eager=True)
    sig = minhash_signature(shingled, num_hashes)
    bands = []
    for b in range(num_bands):
        cols = [F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig")))
    band_ids = sig.select(
        "id", F.explode(F.array(*bands)).alias("bs")
    ).select("id", "bs.band", "bs.sig")
    if materialize:
        band_ids = band_ids.localCheckpoint(eager=True)
    return shingled, band_ids


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_MINHASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """The persistable MinHash inverted file: (id, band, sig), one row
    per document per band. Write this per corpus snapshot; the next
    crawl's dedup pass (minhash_lsh_pairs_incremental) then reads it
    instead of recomputing shingles + signatures for the whole corpus —
    the index is ~num_bands small fixed-width rows per document, never
    document text."""
    return _shingle_and_bands(df, id_col, text_col, num_hashes, num_bands)[1]


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
    # Ids ONLY through the band shuffle: shipping the document-sized
    # shingle arrays on both sides of the self-join would multiply
    # shuffle volume by ~doc_size x num_bands at 100TB. Candidate id
    # pairs are deduped first; the shingle arrays are joined back ONCE
    # per side for the exact-Jaccard verify.
    shingled, band_ids = _shingle_and_bands(
        df, id_col, text_col, num_hashes, num_bands, materialize=True
    )

    left = band_ids.select(F.col("id").alias("id_a"), "band", "sig")
    right = band_ids.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        left.join(right, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _exact_jaccard_verify(cand, shingled, jaccard_threshold)


def _exact_jaccard_verify(
    cand: DataFrame, shingled: DataFrame, jaccard_threshold: float
) -> DataFrame:
    """Shared verify tail of the batch and incremental MinHash paths:
    join the shingle arrays back once per side of each candidate id
    pair, compute exact shingle-set Jaccard, keep pairs >= threshold.
    ONE definition — the incremental==batch-restriction parity property
    depends on both paths verifying identically."""
    cand = cand.join(
        shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
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


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_MINHASHES,
    num_bands: int = NUM_BANDS,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Incremental near-dup pass: every pair involving at least one NEW
    document — new-vs-corpus and new-vs-new — without re-banding the
    corpus. EXACTLY equals minhash_lsh_pairs(new ∪ corpus) restricted
    to pairs touching a new id (property-tested), with id_a < id_b.

    The snapshot pattern a rolling crawl runs: persist
    ``minhash_band_index(corpus)`` once per snapshot and pass it as
    ``corpus_index`` (computed from corpus_docs when None); only the
    new slice is shingled/hashed up front. Corpus text is touched
    twice, both times candidate-bounded: the exact-Jaccard verify
    needs shingles for candidate corpus docs only, so corpus_docs is
    LEFT SEMI-pruned to candidate ids BEFORE shingling — at 100TB the
    full corpus is never re-shingled, only the (tiny) candidate set.
    Ids must be distinct across the two inputs (crawl ids are)."""
    shingled_new, bands_new = _shingle_and_bands(
        new_docs, id_col, text_col, num_hashes, num_bands, materialize=True
    )
    if corpus_index is None:
        corpus_index = minhash_band_index(
            corpus_docs, id_col, text_col, num_hashes, num_bands
        )
    else:
        # A persisted index built with a different banding config is a
        # SILENT total-recall loss (band sigs never collide with the
        # new slice's) — the same failure class ivf_ann_topk guards
        # with its centroid-dim check. Band ids are checkable in-plan:
        # an index with band >= num_bands was built with more bands
        # (and one with fewer is unobservable from ids alone, so the
        # hash-count mismatch is documented as caller contract).
        missing = {"id", "band", "sig"} - set(corpus_index.columns)
        if missing:
            raise ValueError(
                f"corpus_index missing columns {sorted(missing)}; expected "
                "the (id, band, sig) frame written by minhash_band_index"
            )
        corpus_index = corpus_index.where(
            F.when(
                (F.col("band") < 0) | (F.col("band") >= num_bands),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "minhash_lsh_pairs_incremental: corpus_index "
                            f"band out of range for num_bands={num_bands} "
                            "(index built with a different banding config?): "
                        ),
                        F.col("band").cast("string"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    all_bands = corpus_index.select("id", "band", "sig").unionByName(bands_new)

    left = bands_new.select(F.col("id").alias("id_a"), "band", "sig")
    right = all_bands.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        left.join(right, ["band", "sig"])
        .where(F.col("id_a") != F.col("id_b"))
        # new-new candidates arrive in both orientations, new-corpus in
        # one; normalize to id_a < id_b, then dedup across bands.
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    corpus_needed = corpus_docs.join(
        cand_ids, corpus_docs[id_col] == cand_ids["id"], "left_semi"
    )
    shingled_needed = word_shingles(
        corpus_needed.select(id_col, text_col), text_col
    ).select(F.col(id_col).alias("id"), "shingles")
    all_shingled = shingled_new.unionByName(shingled_needed)
    return _exact_jaccard_verify(cand, all_shingled, jaccard_threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    prefix_words: int = 30,
    threshold: float = 0.5,
    max_group_rows: int | None = 100_000,
) -> DataFrame:
    """Exact word-set Jaccard over bounded word prefixes, within groups
    — the O(n^2)-WITHIN-GROUP small-scale / oracle-checkable variant;
    minhash_lsh_pairs is the curation/scale path. To make that intent
    unmissable, the call REFUSES inputs whose largest group exceeds
    max_group_rows (pass None to waive, accepting the quadratic join)."""
    base = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(group_col).alias("grp")] if group_col else [F.lit(1).alias("grp")] ),
        F.array_distinct(F.slice(_words(text_col), 1, prefix_words)).alias("ws"),
    )
    if max_group_rows is not None:
        # In-pipeline guard (no separate eager job recomputing the input):
        # a count window on grp — the same key the join shuffles on, so
        # the clustering is reused — raises at execution time the moment
        # any group exceeds the bound.
        from pyspark.sql import Window

        base = base.withColumn(
            "_gcnt", F.count(F.lit(1)).over(Window.partitionBy("grp"))
        )
        base = base.where(
            F.when(
                F.col("_gcnt") > F.lit(max_group_rows),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "ngram_jaccard_pairs is the all-pairs-within-group "
                            "oracle variant: group "
                        ),
                        F.col("grp").cast("string"),
                        F.lit(f" exceeds max_group_rows={max_group_rows}. Use "
                              "minhash_lsh_pairs at scale, or pass "
                              "max_group_rows=None to accept O(n^2)."),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        ).drop("_gcnt")
    # Both self-join sides read `base`; without materialization each
    # side re-tokenizes the corpus (and re-runs the guard window). The
    # frame is (id, grp, <=prefix_words words) — small at any corpus
    # size relative to the O(n^2) join it feeds.
    base = base.localCheckpoint(eager=True)
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


SIMHASH_BITS = 60  # 15 hex chars of md5 — fits a signed 64-bit long
SIMHASH_MAX_TOKENS = 32767  # 15-bit packed counters (see simhash())


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document: sign of per-bit sums of word hashes
    (one ±1 vote per token OCCURRENCE) — bit b set iff
    2 * count(tokens with bit b) > n_tokens.

    The token hash is the first 15 hex chars of md5 parsed as an integer
    — chosen over xxhash64 deliberately: md5 is bit-identical across
    engines, so an independent DuckDB oracle can recompute the whole
    fingerprint and verify emitted pairs exactly (xxhash64 exists only
    in Spark).

    ZERO-SHUFFLE: the per-bit counts are higher-order aggregates over
    the in-row token-hash array (no explode, no groupBy) — the
    fingerprint stage is a narrow map, so at 100TB it scales with input
    splits like the extraction path.

    Votes are counted over the FIRST 32767 tokens (SIMHASH_MAX_TOKENS):
    the bit-sliced counters below hold 15 bits per lane, and a silent
    overflow on a mega-document would corrupt adjacent counters and
    void the exact-recall contract. The cap is enforced identically in
    the DuckDB oracle, so both engines fingerprint the same prefix."""
    words = F.slice(_words(text_col), 1, SIMHASH_MAX_TOKENS)
    hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
    )
    d = df.select(
        F.col(id_col).alias("id"), hashes.alias("_h"), F.size(words).alias("_n")
    )

    # Bit-sliced counting: each aggregate pass maintains FOUR 15-bit
    # counters packed in one long (lanes at bit offsets 0/15/30/45), so
    # the 60 per-bit counts need 15 passes instead of 60. Overflow-safe
    # by construction: the token slice above caps counts at 32767 and
    # the top lane stays clear of the sign bit.
    def _packed(g: int):
        # factory closure: never capture a loop var inside the lambda
        def step(acc, h):
            contrib = F.shiftright(h, g).bitwiseAND(F.lit(1))
            for lane in (1, 2, 3):
                contrib = contrib + F.shiftleft(
                    F.shiftright(h, g + 15 * lane).bitwiseAND(F.lit(1)), 15 * lane
                )
            return acc + contrib

        return F.aggregate("_h", F.lit(0).cast("long"), step)

    d = d.select(
        "id", "_n", *[_packed(g).alias(f"_p{g}") for g in range(15)]
    )
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        g, lane = b % 15, b // 15
        ones = F.shiftright(F.col(f"_p{g}"), 15 * lane).bitwiseAND(F.lit(0x7FFF))
        sim = sim + F.when(
            2 * ones > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
    return d.select("id", sim.alias("simhash"))


def _band_slices(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per band: max_hamming+1 near-equal slices of the 60
    bits. Pigeonhole GUARANTEES recall 1.0: a pair with <= max_hamming
    differing bits cannot differ in all max_hamming+1 disjoint slices,
    so it agrees exactly on >= 1 band key."""
    n_bands = max_hamming + 1
    if n_bands > SIMHASH_BITS:
        raise ValueError(f"max_hamming must be < {SIMHASH_BITS}")
    base, extra = divmod(SIMHASH_BITS, n_bands)
    slices = []
    shift = 0
    for q in range(n_bands):
        width = base + (1 if q < extra else 0)
        slices.append((shift, width))
        shift += width
    return slices


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash with PROVABLY exact recall: band on
    max_hamming+1 disjoint bit slices (see _band_slices), candidate ids
    only through the band self-join, verify bit_count(xor) <= max_hamming
    after pair-dedup. Output == exact all-pairs hamming filter, which is
    what the DuckDB oracle checks.

    Choosing max_hamming: bands get NARROWER as it grows (60 bits split
    max_hamming+1 ways), so candidate collisions grow ~2^-width per
    band — at 100 TB keep it small. The default 3 (4x15-bit bands,
    32k buckets/band) is the scale setting; the driver's dedup_simhash
    query uses 4 (5x12-bit bands) because the synthetic oracle corpus
    needs the looser radius to produce non-trivial pair counts, still
    with 4096 buckets per band.

    The fingerprint frame is referenced FOUR times in this DAG (both
    band sides + two per-pair join-backs); without materialization the
    60-bit-slice aggregation over every token would run 4x. The frame is
    (id, long) — trivially small; at 10^12 docs write it as an
    intermediate table instead (materialize=False + caller persists)."""
    s = simhash(df, id_col, text_col)
    if materialize:
        s = s.localCheckpoint(eager=True)
    bands = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright(F.col("simhash"), shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for q, (shift, width) in enumerate(_band_slices(max_hamming))
        ]
    )
    e = s.select("id", F.explode(bands).alias("b")).select("id", "b.q", "b.key")
    a = e.select(F.col("id").alias("id_a"), "q", "key")
    bdf = e.select(F.col("id").alias("id_b"), "q", "key")
    cand = (
        a.join(bdf, ["q", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Fingerprints joined back AFTER pair-dedup (ids only ride the bands).
    cand = cand.join(
        s.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a")), "id_a"
    ).join(s.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b")), "id_b")
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star contraction round over an (u, v)
    edge frame (SoCC'14). Hub-degree-bounded: neighborhood minima come
    from scalar `min` aggregates joined back onto the edges — a hub of
    degree d contributes d three-scalar rows, never a d-element array,
    and no array-typed column crosses any Exchange (plan-asserted in
    tests/test_plan_shapes.py::test_star_round_is_hub_degree_bounded).
    """
    # Large-star: every neighbor LARGER than u links to the minimum of
    # u's closed neighborhood.
    und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    large = (
        und.where("v > u")
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where("u != v")
    )
    # Small-star: direct edges large->small, then every smaller
    # neighbor (and u itself) links to the neighborhood minimum.
    # (No intermediate distinct between the stars: the small-star min
    # is duplicate-insensitive and the round's closing distinct dedups
    # — one Exchange fewer per round; duplicate rows between the stars
    # stay bounded by |und|.)
    directed = large.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins2 = directed.groupBy("u").agg(F.min("v").alias("m"))
    return (
        directed.join(mins2, "u")
        .where("v != m")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins2.select("u", F.col("m").alias("v")))
        .where("u != v")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 12,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over a
    near-dup pair list -> (doc_id, component_id), component_id = min doc
    id in the component. The stage a dedup pipeline runs AFTER
    MinHash/SimHash pair generation, so "A~B, B~C" collapses to one
    keeper even when A~C was never emitted.

    Ids may be any orderable type (numeric doc ids or url strings —
    the CLI curation frame keys on url); component_id is the minimum
    under that type's ordering.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): chains contract in
    O(log d) rounds (vs O(d) for naive label propagation), and every
    shuffle carries bare (id, id) edges only. Each star pass is
    **hub-degree-bounded**: the per-node neighborhood minimum comes
    from a `min` aggregate (map-side partial combine keeps per-key
    state to one scalar per partition) joined back onto the edge list
    — no `collect_set` neighborhood arrays, so a 10M-copy boilerplate
    cluster's hub node never materializes its neighborhood in a single
    row, and no array-typed column ever crosses an Exchange
    (plan-asserted in tests/test_plan_shapes.py). The edge frame is
    localCheckpoint-ed per round — iterative plans otherwise grow the
    lineage/codegen DAG linearly in rounds. Convergence = fixpoint of
    the edge multiset (checked via count + order-insensitive hash sum,
    one tiny aggregate job per round); raises if max_iter rounds do not
    converge (12 rounds cover chains of ~2^12 docs).
    """
    e = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).where("u IS NOT NULL AND v IS NOT NULL AND u != v")
    edges = e.distinct().localCheckpoint(eager=True)
    # Node set derived from the CHECKPOINTED frame: deriving it from the
    # pre-checkpoint lineage would re-run the entire upstream
    # pair-generation DAG (LSH banding + verify) a second time when the
    # result is evaluated.
    nodes = edges.select("u").union(
        edges.select(F.col("v").alias("u"))
    ).distinct()

    def _sig(df: DataFrame):
        # decimal(38,0) accumulator: a bigint sum of 64-bit hashes
        # overflows (ANSI) after a handful of rows.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(edges)
    for _ in range(max_iter):
        edges = _star_round(edges).localCheckpoint(eager=True)
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # At the fixpoint every edge is (member, component-min); nodes that
    # appear only as roots map to themselves.
    membership = edges.groupBy("u").agg(F.min("v").alias("component_id"))
    return nodes.join(membership, "u", "left").select(
        F.col("u").alias("doc_id"),
        F.coalesce("component_id", F.col("u")).alias("component_id"),
    )


def merge_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 12,
) -> DataFrame:
    """Incremental connected components: fold a NEW batch of near-dup
    pairs into an existing (doc_id, component_id) label table without
    re-running CC over the full historical pair list — the label-side
    companion of minhash_lsh_pairs_incremental. A prior component is
    already fully described by its (member -> label) edges (the label
    IS a member, the component minimum), so CC over
    ``labels-as-edges UNION new pairs`` reproduces exactly the labels
    a from-scratch run over all pairs ever seen would produce — while
    the input is one edge per EXISTING DOC plus the new pairs, not the
    full pair history (a 10^6-copy boilerplate cluster contributes
    10^6 label edges, not the 10^7+ pairs that built it; singleton
    docs need no label row at all).

    Labels stay min-id-stable: a merge of two old components relabels
    the loser to the global minimum, new docs adopt the minimum of
    whatever they touch. Returns the new complete label table — docs
    in ``labels`` keep a row even if untouched this batch.

    Same hub-safe star-contraction engine and (id, id)-only shuffles
    as connected_components."""
    lab = labels.select(
        F.col("doc_id").alias(src), F.col("component_id").alias(dst)
    ).where(F.col(src) != F.col(dst))
    np = new_pairs.select(src, dst)
    return connected_components(lab.unionByName(np), src=src, dst=dst,
                                max_iter=max_iter)


def minhash_estimate_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    jaccard_threshold: float = 0.5,
    k: int = SHINGLE_K,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """MinHash estimator audit — the dedup-side sibling of ann_recall:
    for every TRUE near-dup pair (exact shingle-set Jaccard >=
    threshold), compare the MinHash ESTIMATE (matching signature
    components / num_hashes, an unbiased estimator with stderr
    ~ sqrt(j(1-j)/H)) against the exact value. This is how you SIZE
    num_hashes: if the observed |error| tail crosses the banding
    threshold margin, pairs are being missed/over-collected and H must
    grow.

    Signatures here use the SEEDED-MD5 family (min over shingles of
    hash60(j || ':' || shingle)) rather than production's xxhash64
    (minhash_signature) — estimator STATISTICS are hash-family-
    independent (any uniform family gives the same expectation), and
    md5-hex15 is the one construction the DuckDB oracle can replay
    bit-exactly (texthash.py discipline; xxhash64 has no DuckDB
    equivalent — the documented divergence).

    All-pairs-within-corpus like ngram_jaccard_pairs, and guarded the
    same way: audits run on samples, so inputs over ``max_rows`` are
    refused (pass None to waive). Returns
    (id_a, id_b, jaccard, est_jaccard, abs_err), all rounded 6."""
    if num_hashes < 1:
        raise ValueError("minhash_estimate_audit: num_hashes must be >= 1")
    h = int(num_hashes)
    base = (
        word_shingles(df.select(id_col, text_col), text_col, k=k)
        .select(F.col(id_col).alias("id"), F.array_distinct("shingles").alias("_sh"))
        .where(F.size("_sh") > 0)
    )
    if max_rows is not None:
        # in-plan bound via a broadcast one-row count — NOT a global
        # window, which would move the shingle arrays to one partition
        # just to count them
        cnt = base.agg(F.count(F.lit(1)).alias("_cnt"))
        base = base.crossJoin(F.broadcast(cnt)).where(
            F.when(
                F.col("_cnt") > F.lit(max_rows),
                F.raise_error(
                    F.lit(
                        "minhash_estimate_audit is the all-pairs audit "
                        f"variant: corpus exceeds max_rows={max_rows}. "
                        "Audit a sample, or pass max_rows=None to accept "
                        "O(n^2)."
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        ).drop("_cnt")
    sig = F.expr(
        f"transform(sequence(0, {h - 1}), j -> array_min(transform(_sh, "
        f"s -> cast(conv(substring(md5(concat(cast(j as string), ':', s)), 1, 15), 16, 10) as bigint))))"
    )
    sided = base.select("id", "_sh", sig.alias("_sig"))
    a = sided.select(
        F.col("id").alias("id_a"), F.col("_sh").alias("sh_a"), F.col("_sig").alias("sig_a")
    )
    b = sided.select(
        F.col("id").alias("id_b"), F.col("_sh").alias("sh_b"), F.col("_sig").alias("sig_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ) / F.lit(float(h))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_j", jac)
        .where(F.col("_j") >= jaccard_threshold)
        .withColumn("_e", est)
        .select(
            "id_a",
            "id_b",
            F.round("_j", 6).alias("jaccard"),
            F.round("_e", 6).alias("est_jaccard"),
            F.round(F.abs(F.col("_j") - F.col("_e")), 6).alias("abs_err"),
        )
    )
