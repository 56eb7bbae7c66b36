"""Relational six-stage extraction cascade — native Catalyst re-expression.

Byte-identical to the sequential kernel (ocr_poc_spark/extractor.py,
itself the faithful port of /root/reference/ocr/extractors/*): pytest
asserts per-url equality on every output column. Mapping (SURVEY.md §2):

  F1 quality gate      -> higher-order array fns (no shuffle)
  F2-F4 noise filters  -> native column predicates on the exploded stream
  R1-R6 fixed claims   -> regexp predicates + min-idx windows, sequential
                          claim interaction resolved in field-priority
                          order (J5 elimination = idx exclusion)
  J1 fuzzy anchors     -> broadcast theta-join + Arrow-batched sim UDF,
                          provable length prune before the UDF
  W1 best anchor       -> row_number over (url, field) by (sim desc, idx)
  J2 proximity binding -> self-join on url + geometric predicate +
                          row_number by (combined score desc, idx)
  used_values dedup    -> row_number over (url, value) by field priority
  W3 positional        -> rank remaining blocks x rank missing fields
  A3 consolidation     -> pivot on field with explicit value list
  A2 confidence        -> arithmetic over consolidated columns

Shuffle budget: ONE hash exchange on url — every window / aggregation /
join downstream is keyed by url (or (url, field) ⊇ url), so Spark reuses
the url clustering; the broadcast anchor join is shuffle-free. At
10^12-document scale the cascade therefore costs a single
repartition-by-url plus narrow stages.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from ..extractor import (
    ALL_FIELDS,
    EMPTY_DOC_MSG,
    INSUFFICIENT_QUALITY_MSG,
    INTERNAL_ERROR_MSG_PREFIX,
    UNSUPPORTED_FORMAT_MSG,
    KIND_GATES,
    POSITIONAL_FIELDS,
    QUALITY_THRESHOLD,
    STOP_PHRASES,
)
from ..textproc.simtext import ANCHOR_FIELDS, ANCHORS, SIMILARITY_THRESHOLD

# Java-regex translations of the kernel's patterns (ASCII inputs only —
# fixtures contain no unicode digits, where python \d and java \d differ).
DATE_RE_J = r"^\d{1,2}[./]\d{1,2}[./]\d{4}$"
READING_RE_J = r"^(\d{1,3}) min read$"
COMMENTS_RE_J = r"^(\d+) comments?$"
ITEMS_RE_J = r"^(\d+) items?$"
PAGEINFO_RE_J = r"^Page (\d+) of (\d+)$"
ALLCAPS3_J = r"^[A-Z]{3}$"
NON_ASCII_J = r"[^\x00-\x7F]"

_MAX_ANCHOR_LEN = max(len(a) for v in ANCHORS.values() for a in v)


# ---------------------------------------------------------------------------
# Arrow-batched UDFs (the only two Python touchpoints, per SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@F.pandas_udf(T.DoubleType())
def sim_udf(text: pd.Series, anchor: pd.Series) -> pd.Series:
    from ocr_poc_spark.textproc.simtext import similarity_score

    memo: dict[tuple[str, str], float] = {}
    out = []
    for t, a in zip(text, anchor):
        key = (t, a)
        v = memo.get(key)
        if v is None:
            v = similarity_score(t, a)
            memo[key] = v
        out.append(v)
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.BooleanType())
def is_label_udf(text: pd.Series) -> pd.Series:
    from ocr_poc_spark.textproc.simtext import is_likely_label

    memo: dict[str, bool] = {}
    out = []
    for t in text:
        v = memo.get(t)
        if v is None:
            v = is_likely_label(t)
            memo[t] = v
        out.append(v)
    return pd.Series(out, dtype="bool")


def anchors_df(spark: SparkSession) -> DataFrame:
    """Broadcast lookup table (field, field_ord, anchor, anchor_ord) —
    the reference's anchor dictionaries (_18_f.py:26-33) as data."""
    rows = [
        (field, f_ord, anchor, a_ord)
        for f_ord, field in enumerate(ANCHOR_FIELDS)
        for a_ord, anchor in enumerate(ANCHORS[field])
    ]
    return spark.createDataFrame(rows, "field string, field_ord int, anchor string, anchor_ord int")


def _gate_exprs(parsed: DataFrame) -> DataFrame:
    """F1/A1: doc-level quality gate via higher-order array functions —
    computed without exploding, i.e. zero shuffle."""
    valid_scores = F.transform(
        F.filter("blocks", lambda b: b["score"] > F.lit(0.0)), lambda b: b["score"]
    )
    n_valid = F.size(valid_scores)
    sum_valid = F.aggregate(valid_scores, F.lit(0.0), lambda acc, s: acc + s)
    avg = F.when(n_valid > 0, sum_valid / n_valid).otherwise(F.lit(0.0))
    n_good = F.size(F.filter("blocks", lambda b: b["score"] > F.lit(0.7)))

    k1 = F.lit(None).cast("int")
    k2 = F.lit(None).cast("int")
    for kind, (a, b) in KIND_GATES.items():
        k1 = F.when(F.col("doc_kind") == kind, F.lit(a)).otherwise(k1)
        k2 = F.when(F.col("doc_kind") == kind, F.lit(b)).otherwise(k2)
    k1 = F.coalesce(k1, F.lit(8))
    k2 = F.coalesce(k2, F.lit(5))

    return parsed.select(
        "url",
        "doc_kind",
        "blocks",
        F.size("blocks").alias("n_blocks"),
        avg.alias("quality_score"),
        (
            (n_valid >= k1) & (avg >= F.lit(QUALITY_THRESHOLD)) & (n_good >= k2)
        ).alias("can_proceed"),
        F.array_join(F.transform("blocks", lambda b: b["text"]), " ").alias("raw_text"),
    )


def _preprocess(stream: DataFrame) -> DataFrame:
    """F2 noise filter + F3 boilerplate/stop phrases + F4 pdf-bleed +
    listing all-caps codes (kernel preprocess())."""
    fmt = F.split("doc_kind", "/").getItem(0)
    layout = F.split("doc_kind", "/").getItem(1)
    t = F.trim("text")
    keep = (
        (F.col("score") >= F.lit(0.3))
        & (F.length(t) > 0)
        & ~((F.length(t) <= 2) & t.rlike(NON_ASCII_J))
        & F.when(
            fmt == "html",
            ~F.col("boiler") & ~F.upper(t).isin(list(STOP_PHRASES)),
        ).otherwise(F.lit(True))
        & F.when(
            fmt == "pdf",
            ~(t.startswith("%%") | t.contains("<<<")),
        ).otherwise(F.lit(True))
        & F.when(layout == "listing", ~t.rlike(ALLCAPS3_J)).otherwise(F.lit(True))
    )
    return stream.where(keep).withColumn("text", t)


def _fixed_claims(stream: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R1-R6 + J5: sequential first-match-wins claims, per-kind battery.

    claim(f) = min idx among f-matchers (of kinds whose battery has f)
    excluding earlier fields' claimer blocks — provably equivalent to
    the reference's scan with `continue` (see kernel
    extract_fixed_format_fields): because claim(e) is minimal among
    e-eligible matchers, a block is consumed by an earlier field iff its
    idx equals that field's claim idx. Each kind's battery is a
    subsequence of the global FIXED_FIELDS order, so one window per
    global field (gated by doc_kind) reproduces every kind's scan.

    Returns (remaining stream, fixed_rows(url, field, value, idx,
    char_offset, n_chars)).
    """
    from ..extractor import FIXED_FIELDS, KIND_FIXED_FIELDS

    w_url = Window.partitionBy("url")
    s = stream
    nf = len(FIXED_FIELDS)
    if os.environ.get("CASCADE_VARIANT") != "fused_claims":
        # DEFAULT: one chained WindowExec PER FIELD (each field's min
        # excludes the previous fields' window outputs, so Catalyst
        # cannot collapse them). MEASURED FASTER than the fused
        # single-window variant below — interleaved A/B at 30k pages,
        # local[32]: this chain's annotated phase ~2.8s/pass vs ~6.6s
        # fused. The six same-sort mins are whole-stage-codegen'd and
        # share ONE partition sort; the fused variant's claims fold is a
        # higher-order-function expression (CodegenFallback — runs
        # INTERPRETED once per block row), which costs more than five
        # extra codegen'd window scans save. Do not re-fuse without
        # re-measuring interleaved.
        claim_cols: list[str] = []
        for fname, pat, _norm in FIXED_FIELDS:
            kinds = [k for k, fl in KIND_FIXED_FIELDS.items() if fname in fl]
            cond = F.col("text").rlike(pat.pattern) & F.col("doc_kind").isin(
                kinds
            )
            for prev in claim_cols:
                cond = cond & (F.col("idx") != F.coalesce(prev, F.lit(-1)))
            col = f"claim_{fname}"
            s = s.withColumn(col, F.min(F.when(cond, F.col("idx"))).over(w_url))
            claim_cols.append(col)
        claims = F.array(
            *[F.coalesce(F.col(c), F.lit(-1)).cast("long") for c in claim_cols]
        )
        s = s.withColumn("_claims", claims).drop(*claim_cols)
    else:
        # FUSED VARIANT (kept for the measured negative result + A/B
        # probing; see default branch): ONE WindowExec for all six
        # claims. Each field can exclude at most nf-1 earlier idxs, so
        # the first nf matching idxs per field determine every claim;
        # six SAME-SPEC window collects fuse into one WindowExec pass
        # and the claims resolve per row with a bounded fold over
        # <= nf*nf longs. Fewer plan nodes, but the fold is
        # CodegenFallback (interpreted per block row) — measured ~2x
        # the annotated-phase wall of the chained default.
        cand_cols = []
        for fname, pat, _norm in FIXED_FIELDS:
            kinds = [k for k, fl in KIND_FIXED_FIELDS.items() if fname in fl]
            cond = F.col("text").rlike(pat.pattern) & F.col("doc_kind").isin(
                kinds
            )
            cand_cols.append(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.when(cond, F.col("idx").cast("long"))
                        ).over(w_url)
                    ),
                    1,
                    nf,
                )
            )
        s = s.withColumn("_cands", F.array(*cand_cols))
        # Sequential claim resolution: fold over field order; each field
        # takes its smallest candidate idx not already claimed (-1 = no
        # claim, mirroring the legacy coalesce(prev, -1) sentinel — a
        # real idx is never negative). aggregate/filter lambdas here use
        # the (acc, x) / single-arg shapes only.
        s = s.withColumn(
            "_claims",
            F.expr(
                f"""
                aggregate(
                  sequence(0, {nf - 1}),
                  cast(array() as array<bigint>),
                  (acc, j) -> concat(acc, array(coalesce(
                    try_element_at(
                      filter(element_at(_cands, j + 1),
                             x -> NOT array_contains(acc, x)),
                      1),
                    cast(-1 as bigint))))
                )
                """
            ),
        ).drop("_cands")

    claimed_field = F.lit(None).cast("string")
    for j, (fname, _pat, _norm) in reversed(list(enumerate(FIXED_FIELDS))):
        claimed_field = F.when(
            F.col("idx").cast("long") == F.get("_claims", F.lit(j)),
            F.lit(fname),
        ).otherwise(claimed_field)
    s = s.withColumn("claimed_field", claimed_field).drop("_claims")

    value = (
        F.when(F.col("claimed_field") == "pub_date", F.col("text"))
        .when(
            F.col("claimed_field") == "reading_time",
            F.concat(F.regexp_extract("text", READING_RE_J, 1), F.lit(" min")),
        )
        .when(
            F.col("claimed_field") == "comment_count",
            F.regexp_extract("text", COMMENTS_RE_J, 1),
        )
        .when(
            F.col("claimed_field") == "item_count",
            F.regexp_extract("text", ITEMS_RE_J, 1),
        )
        .when(
            F.col("claimed_field") == "page_info",
            F.concat(
                F.regexp_extract("text", PAGEINFO_RE_J, 1),
                F.lit("/"),
                F.regexp_extract("text", PAGEINFO_RE_J, 2),
            ),
        )
        .when(F.col("claimed_field") == "doc_ref", F.col("text"))
    )
    # One ANNOTATED stream (claimed_field + normalized claim value on the
    # claimer rows, null elsewhere) — the caller splits it into
    # remaining/fixed_rows AFTER a single checkpoint, instead of
    # materializing two separate frames.
    return s.withColumn("claim_value", value)


def run_cascade(
    parsed: DataFrame,
    spark: SparkSession,
    materialize: bool = True,
    debug_frames: dict | None = None,
    timings: dict | None = None,
) -> DataFrame:
    """parsed(url, doc_kind, blocks) -> extracted (EXTRACTED_SCHEMA order).

    Physical shape: the parse-UDF output is persisted so the expensive
    payload parse runs ONCE even though the cascade DAG fans out into
    ~8 branches (anchors, binding, positional, body, spans, map, pivot);
    the block stream is then hash-partitioned by url ONCE — every
    downstream window/join/aggregation clusters on (url, ...) supersets,
    which hash(url) satisfies, so no further exchanges are inserted for
    them. At 10^12-doc scale, `materialize=False` + writing the parsed
    block table between the two stages replaces the in-memory persist.
    """
    # Unique per-document key: re-crawled corpora legitimately contain the
    # same url twice (distinct warc_ts); every window/join/aggregation
    # below keys on `url`, so two rows sharing one would get their block
    # streams interleaved and merged. Suffix a monotonic row id (US-unit
    # separator cannot occur in a url) and strip it again on output —
    # each input ROW then flows through the cascade as its own document,
    # matching the fused path's one-output-row-per-input-row contract.
    #
    # CONTRACT for materialize=False: the ids are only consistent across
    # the cascade's branches when the eager localCheckpoint below freezes
    # them. Callers that disable materialization (the write-intermediate-
    # tables deployment) MUST feed a STABLE source (a written table, not
    # a live round-robin repartition), or re-evaluation could assign
    # different ids per branch and mis-join documents.
    import time as _time

    _lazy = os.environ.get("CASCADE_VARIANT") == "lazy_ckpts"

    def _ckpt(df: DataFrame, name: str) -> DataFrame:
        # Eager checkpoint with optional wall attribution (probe support:
        # each barrier is a serial driver-side wait, so per-name walls sum
        # to ~the whole build phase). The lazy_ckpts A/B variant drops
        # the DOWNSTREAM barriers: each checkpoint then materializes
        # inside its first consuming job (computed once, later consumers
        # read the persisted blocks) — same work, fewer stop-the-world
        # pauses. The 'parsed' checkpoint stays EAGER even in the lazy
        # variant: it is what freezes the monotonic doc ids before the
        # ~8-branch fan-out (see the CONTRACT comment above); a lazy
        # parsed checkpoint over a live round-robin source could let
        # branches observe different id assignments — mis-joined docs.
        t0 = _time.perf_counter()
        out = df.localCheckpoint(eager=not _lazy or name == "parsed")
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + (_time.perf_counter() - t0)
        return out

    parsed = parsed.withColumn(
        "url",
        F.concat_ws(
            "\x1f", "url", F.monotonically_increasing_id().cast("string")
        ),
    )
    if materialize:
        # localCheckpoint (lazy) instead of persist: it also truncates the
        # LOGICAL lineage, so the ~10 downstream branches embed a short
        # LogicalRDD scan instead of the full parse subtree — Catalyst
        # analysis of this fan-out plan drops from ~13s to <1s per
        # action. Fault recovery for the truncated stage is provided at
        # the job level by the bucket manifest (plans/job.py), not by
        # RDD lineage. It also freezes the monotonic row ids above.
        parsed = _ckpt(parsed, "parsed")
    gate = _gate_exprs(parsed)
    passing = gate.where("can_proceed")

    stream = passing.select(
        "url", "doc_kind", F.explode("blocks").alias("b")
    ).select("url", "doc_kind", "b.*")
    stream = _preprocess(stream)
    # THE one url-hash exchange for the whole cascade.
    stream = stream.repartition("url")

    annotated = _fixed_claims(stream)
    annotated = annotated.withColumn("is_label", is_label_udf("text"))
    if materialize:
        # Compact (url, idx, text, score, x, y, offsets, claimed_field,
        # is_label) rows — orders of magnitude smaller than the raw
        # payloads; ONE checkpoint stops the claim windows + label UDF
        # re-running per branch AND keeps the url-hash partitioning as
        # the cached layout (remaining/fixed_rows are cheap filters of it).
        annotated = _ckpt(annotated, "annotated")
    remaining = annotated.where(F.col("claimed_field").isNull()).drop(
        "claimed_field", "claim_value"
    )
    fixed_rows = annotated.where(F.col("claimed_field").isNotNull()).select(
        "url",
        F.col("claimed_field").alias("field"),
        F.col("claim_value").alias("value"),
        "idx",
        "char_offset",
        "n_chars",
    )

    # ---- J1: fuzzy anchor detection (broadcast theta-join) -------------
    adf = anchors_df(spark)
    cand = remaining.where(
        (F.col("n_chars") <= 3 * _MAX_ANCHOR_LEN)  # coarse pre-prune
    )
    pairs = cand.join(F.broadcast(adf))
    # Conservative mirror of the kernel's similarity_score length prune.
    # The kernel prunes on lengths measured AFTER Python .upper(), which
    # can grow a string up to 3x per char (ß→SS, ΐ→3 chars) but never
    # shrink it; here only the raw length lt is available, so a pair is
    # dropped only when the kernel would drop it for EVERY possible
    # upper-length LT in [lt, 3lt]: text-too-long (lt > 3*la, since
    # LT >= lt) or text-way-too-short (9*lt < la, since LT <= 3lt).
    # False keeps are harmless — sim_udf recomputes the exact prune.
    lt = F.length("text")
    la = F.length("anchor")  # anchors are ASCII: la == upper-length
    pairs = pairs.where((lt <= 3 * la) & (9 * lt >= la))
    # Raw text into the UDF: similarity_score uppercases internally, so
    # case mapping is python's on both paths (kernel parity).
    pairs = pairs.withColumn("sim", sim_udf(F.col("text"), F.col("anchor")))
    pairs = pairs.where(F.col("sim") >= F.lit(SIMILARITY_THRESHOLD))
    # Per (url, idx, field): FIRST anchor in list order wins (inner break).
    w_block_field = Window.partitionBy("url", "idx", "field").orderBy("anchor_ord")
    hits = (
        pairs.withColumn("rn", F.row_number().over(w_block_field))
        .where("rn = 1")
        .select("url", "field", "field_ord", "idx", "text", "sim", "x", "y")
    )
    if materialize:
        # A handful of rows per document; consumed by three branches
        # (best-anchor chain, body anti-join, anchors_detected map).
        # Measured (30k pages, interleaved A/B at local[32]): dropping
        # this checkpoint costs ~4s/pass — the three consumers recompute
        # the broadcast sim-UDF join for more than the barrier saves.
        hits = _ckpt(hits, "hits")

    # ---- W1: best anchor per (url, field): max sim, first position ----
    w_field = Window.partitionBy("url", "field").orderBy(
        F.desc("sim"), F.asc("idx")
    )
    best_anchor = (
        hits.withColumn("rn", F.row_number().over(w_field))
        .where("rn = 1")
        .select(
            "url",
            "field",
            "field_ord",
            F.col("idx").alias("a_idx"),
            F.col("x").alias("a_x"),
            F.col("y").alias("a_y"),
        )
    )

    # ---- J2/W2: proximity value binding (self-join on url) ------------
    values = remaining.where(~F.col("is_label")).select(
        "url",
        F.col("idx").alias("v_idx"),
        F.col("text").alias("v_text"),
        F.col("score").alias("v_score"),
        F.col("x").alias("v_x"),
        F.col("y").alias("v_y"),
    )
    cand2 = best_anchor.join(values, "url").where(
        (F.col("v_idx") != F.col("a_idx"))
        & ((F.col("v_x") > F.col("a_x")) | (F.col("v_y") > F.col("a_y")))
    )
    dx = F.col("v_x") - F.col("a_x")
    dy = F.col("v_y") - F.col("a_y")
    dist = F.sqrt(dx * dx + dy * dy)
    combined = F.col("v_score") * (F.lit(1.0) / (F.lit(1.0) + dist / F.lit(100.0)))
    w_bind = Window.partitionBy("url", "field").orderBy(
        F.desc("combined"), F.asc("v_idx")
    )
    bound = (
        cand2.withColumn("combined", combined)
        .withColumn("rn", F.row_number().over(w_bind))
        .where("rn = 1")
        .select(
            "url", "field", "field_ord",
            F.col("v_text").alias("value"),
            F.col("v_idx").alias("src_idx"),
        )
    )

    # ---- used_values dedup: first field (priority order) keeps a value -
    w_val = Window.partitionBy("url", "value").orderBy("field_ord")
    accepted = (
        bound.withColumn("vrn", F.row_number().over(w_val))
        .where("vrn = 1")
        .select("url", "field", "field_ord", "value", "src_idx")
    )

    # ---- W3: positional fallback for missing title/author/category ----
    used = accepted.select("url", F.col("value").alias("text"))
    rem_pos = (
        remaining.where(~F.col("is_label"))
        .join(used, ["url", "text"], "left_anti")
        .withColumn(
            "pos_rank",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.asc("y"), F.asc("idx"))
            ),
        )
    )
    pos_fields = spark.createDataFrame(
        [(f, i + 1) for i, f in enumerate(POSITIONAL_FIELDS)],
        "field string, field_pos int",
    )
    passing_urls = passing.select("url")
    missing = (
        passing_urls.crossJoin(F.broadcast(pos_fields))
        .join(accepted.select("url", "field"), ["url", "field"], "left_anti")
        .withColumn(
            "miss_rank",
            F.row_number().over(Window.partitionBy("url").orderBy("field_pos")),
        )
    )
    positional = missing.join(
        rem_pos.select(
            "url", F.col("pos_rank").alias("miss_rank"),
            F.col("text").alias("value"), F.col("idx").alias("src_idx"),
        ),
        ["url", "miss_rank"],
    ).select("url", "field", "value", "src_idx")

    field_ord_map = {f: i for i, f in enumerate(ALL_FIELDS)}
    all_values = accepted.select("url", "field", "value", "src_idx").unionByName(
        positional
    )

    # ---- W5 pattern fallback: site_name for listing layouts ------------
    from ..extractor import SITE_NAME_FIELD, SITE_NAME_MIN_SCORE

    site_cand = (
        remaining.where(
            F.split("doc_kind", "/").getItem(1).eqNullSafe("listing")
            & ~F.col("is_label")
            & (F.col("score") > F.lit(SITE_NAME_MIN_SCORE))
            & F.col("text").rlike(r"^[A-Z]\S*( [A-Z]\S*)+$")
        )
        .join(all_values.select("url", F.col("value").alias("text")), ["url", "text"], "left_anti")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("url").orderBy("idx"))
        )
        .where("rn = 1")
        .select(
            "url", F.lit(SITE_NAME_FIELD).alias("field"),
            F.col("text").alias("value"), F.col("idx").alias("src_idx"),
        )
    )
    all_values = all_values.unionByName(site_cand)
    if materialize:
        # <= 8 rows per document; body, spans, and the pivot each re-walk
        # the binding chain otherwise.
        all_values = _ckpt(all_values, "all_values")

    # ---- body blocks: stream minus anchors/labels/used values ----------
    used_all = all_values.select("url", F.col("value").alias("text")).distinct()
    anchor_idxs = hits.select("url", "idx").distinct()
    body = (
        remaining.where(~F.col("is_label"))
        .join(anchor_idxs, ["url", "idx"], "left_anti")
        .join(used_all, ["url", "text"], "left_anti")
    )
    # ---- fused final assembly: ONE groupBy(url) pass ---------------------
    # Spans, body_text, anchors_detected AND the consolidated field values
    # all come out of a single collect_list aggregation over one tagged
    # union (previously three groupBy passes + a crossJoin + three final
    # joins — fused to cut per-invocation stage count and driver-side
    # Catalyst analysis; every input is already url-partitioned so the
    # one exchange is reused).
    #
    # Source block per anchor/positional/site value: all_values carries
    # the RECORDED src_idx of the block each value was extracted from
    # (mirrors the kernel's value_sources) — an equi-join on (url, idx)
    # fetches its offsets. A first-text-match lookup here would
    # mis-attribute spans when the value text also occurs in an earlier
    # unrelated block.
    value_src = all_values.select(
        "url", "field", F.col("src_idx").alias("idx")
    ).join(
        remaining.select("url", "idx", "char_offset", "n_chars"),
        ["url", "idx"],
    )
    field_ord_expr = F.lit(None).cast("int")
    for f, i in field_ord_map.items():
        field_ord_expr = F.when(F.col("field") == f, F.lit(i)).otherwise(field_ord_expr)

    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    # Tagged rows — sort key is (kind, ord, idx2): kind 0 = field spans in
    # ALL_FIELDS order, kind 1 = body spans in block order; kinds 2
    # (anchor-field hit) and 3 (consolidated value) are payload-only.
    field_span_rows = value_src.unionByName(
        fixed_rows.select("url", "field", "idx", "char_offset", "n_chars"),
        allowMissingColumns=True,
    ).select(
        "url",
        F.lit(0).alias("kind"),
        field_ord_expr.alias("ord"),
        F.lit(0).alias("idx2"),
        F.col("field"),
        F.col("char_offset").alias("start"),
        (F.col("char_offset") + F.col("n_chars")).alias("end"),
        null_s.alias("text"),
    )
    body_rows = body.select(
        "url",
        F.lit(1).alias("kind"),
        F.lit(0).alias("ord"),
        F.col("idx").alias("idx2"),
        F.lit("body").alias("field"),
        F.col("char_offset").alias("start"),
        (F.col("char_offset") + F.col("n_chars")).alias("end"),
        F.col("text"),
    )
    hit_rows = (
        hits.select("url", "field")
        .distinct()
        .select(
            "url", F.lit(2).alias("kind"), F.lit(0).alias("ord"),
            F.lit(0).alias("idx2"), "field",
            null_i.alias("start"), null_i.alias("end"), null_s.alias("text"),
        )
    )
    value_rows = (
        all_values.select("url", "field", "value")
        .unionByName(fixed_rows.select("url", "field", "value"))
        .select(
            "url", F.lit(3).alias("kind"), F.lit(0).alias("ord"),
            F.lit(0).alias("idx2"), "field",
            null_i.alias("start"), null_i.alias("end"),
            F.col("value").alias("text"),
        )
    )
    unioned = (
        field_span_rows.unionByName(body_rows)
        .unionByName(hit_rows)
        .unionByName(value_rows)
    )
    agg = unioned.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct("kind", "ord", "idx2", "field", "start", "end", "text")
            )
        ).alias("_rows")
    )

    def _field_val(f: str):
        # NB single-arg lambda (two-arg would be read as (element, index)).
        return F.get(
            F.filter(
                "_rows",
                lambda r: (r["kind"] == 3) & (r["field"] == F.lit(f)),
            ),
            0,
        )["text"]

    span_structs = F.transform(
        F.filter("_rows", lambda r: r["kind"] <= 1),
        lambda s: F.struct(
            s["field"].alias("field"),
            s["start"].alias("start"),
            s["end"].alias("end"),
        ),
    )
    body_text_expr = F.nullif(
        F.array_join(
            F.transform(
                F.filter("_rows", lambda r: r["kind"] == 1), lambda s: s["text"]
            ),
            "\n\n",
        ),
        F.lit(""),
    )

    def _anchor_hit(f: str):
        return F.coalesce(
            F.exists("_rows", lambda r: (r["kind"] == 2) & (r["field"] == F.lit(f))),
            F.lit(False),
        )

    anchors_map = F.map_from_entries(
        F.array(
            *[
                F.struct(F.lit(f).alias("key"), _anchor_hit(f).alias("value"))
                for f in ANCHOR_FIELDS
            ]
        )
    )

    out = gate.drop("blocks").join(agg, "url", "left")
    filled = sum((_field_val(f).isNotNull()).cast("int") for f in ALL_FIELDS)
    # Per-kind confidence divisor (anchors + kind battery + site_name on
    # listings); fields outside the kind's set are always null, so the
    # union-wide `filled` equals the kind-scoped count.
    from ..extractor import KIND_FIXED_FIELDS, SITE_NAME_FIELD  # noqa: F401

    n_kind_fields = F.lit(None).cast("int")
    for kind, fl in KIND_FIXED_FIELDS.items():
        n = len(ANCHOR_FIELDS) + len(fl) + (1 if kind.endswith("/listing") else 0)
        n_kind_fields = F.when(F.col("doc_kind") == kind, F.lit(n)).otherwise(
            n_kind_fields
        )
    n_kind_fields = F.coalesce(n_kind_fields, F.lit(len(ALL_FIELDS)))
    out = out.select(
        "url",
        "doc_kind",
        F.col("can_proceed").alias("success"),
        F.when(
            F.col("doc_kind").startswith("error/"),
            F.concat(
                F.lit(INTERNAL_ERROR_MSG_PREFIX),
                F.split("doc_kind", "/").getItem(1),
            ),
        )
        .when(
            (F.col("n_blocks") == 0) & (F.col("doc_kind") == "binary/unknown"),
            F.lit(UNSUPPORTED_FORMAT_MSG),
        )
        .when(F.col("n_blocks") == 0, F.lit(EMPTY_DOC_MSG))
        .when(~F.col("can_proceed"), F.lit(INSUFFICIENT_QUALITY_MSG))
        .alias("message"),
        "quality_score",
        F.when(
            F.col("can_proceed"), filled / n_kind_fields.cast("double")
        ).otherwise(F.lit(0.0)).alias("confidence"),
        "raw_text",
        *[_field_val(f).alias(f) for f in ALL_FIELDS],
        body_text_expr.alias("body_text"),
        F.when(F.col("can_proceed"), F.coalesce(span_structs, F.array()))
        .otherwise(F.array().cast("array<struct<field:string,start:int,end:int>>"))
        .alias("spans"),
        # Passing doc with zero union rows -> all-False map (the kernel's
        # detect_anchors always returns all 4 keys); failed doc -> {}.
        F.when(F.col("can_proceed"), anchors_map)
        .otherwise(
            F.map_from_entries(
                F.array().cast("array<struct<key:string,value:boolean>>")
            )
        )
        .alias("anchors_detected"),
        "n_blocks",
    )
    # Strip the uniquifying row-id suffix added at cascade entry.
    out = out.withColumn("url", F.substring_index("url", "\x1f", 1))
    if debug_frames is not None:
        debug_frames.update(
            parsed=parsed, gate=gate, stream=stream, remaining=remaining,
            fixed_rows=fixed_rows, hits=hits, best_anchor=best_anchor,
            bound=bound, accepted=accepted, positional=positional,
            site_cand=site_cand, all_values=all_values, agg=agg,
        )
    return out
