"""Incremental extraction via Structured Streaming.

The reference is a request/response service (one doc per HTTP call,
/root/reference/api_server.py:177-236); its streaming analogue is a
file/Iceberg stream of newly-landed pages driven through the identical
extraction stage graph. ``trigger(availableNow=True)`` gives catch-up
batch semantics; a continuous deployment would use the same code with a
processing-time trigger. Checkpointing here is Spark's own offset log
(complementary to the batch job's bucket manifest: the stream tracks
*files*, the batch manifest tracks *url-hash buckets*).

The extraction is stateless per document (map-only fused path), so no
watermarks are needed; the optional windowed throughput aggregation
shows the stateful side (per-minute doc counts with a watermark).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..plans.job import extract_fused
from ..schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def start_extraction_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """pages stream -> extracted parquet, exactly-once via checkpoint."""
    pages = read_pages_stream(spark, in_path)
    ext = extract_fused(pages)
    writer = (
        ext.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_throughput_stream(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    query_name: str = "throughput",
) -> StreamingQuery:
    """Stateful side: per-minute ingest counts with late-data watermark
    (the service-metrics analogue, api_server.py:54-58, as a stream).

    outputMode is UPDATE, not complete: Spark IGNORES a watermark under
    complete mode (no state eviction, no late-data dropping, and the
    memory/driver-side sink retains every window forever) — in update
    mode the 10-minute watermark actually evicts window state and drops
    later-than-watermark rows, which is the documented semantics. The
    memory sink accumulates one row per window UPDATE, so consumers take
    the latest row per (window, lang) — a continuous deployment would
    point this at an idempotent upsert sink keyed the same way."""
    pages = read_pages_stream(spark, in_path)
    agg = (
        pages.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "1 minute"), "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    watermark_delay: str | None = None,
) -> StreamingQuery:
    """Streaming ingest dedup: newly-landed pages whose text digest was
    already seen in ANY earlier micro-batch are dropped before they
    reach the corpus (the streaming leg of the exact-dedup curation
    operator, operators/dedup.py).

    State is the Spark-managed digest set keyed by sha2-256 — the
    shuffle and the state store carry 64-char digests, never the page
    bodies. Unbounded by default (exact forever-dedup); pass
    `watermark_delay` (e.g. '1 hour') to bound state at scale via
    dropDuplicatesWithinWatermark — late re-crawls beyond the delay
    then count as fresh, which is the standard state/recall trade."""
    pages = read_pages_stream(spark, in_path)
    keyed = pages.withColumn("digest", F.sha2(F.col("text"), 256))
    if watermark_delay is not None:
        deduped = keyed.withWatermark("warc_ts", watermark_delay)
        deduped = deduped.dropDuplicatesWithinWatermark(["digest"])
    else:
        deduped = keyed.dropDuplicates(["digest"])
    return (
        deduped.drop("digest")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_simhash_pairs_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    max_hamming: int = 3,
    max_state_per_bucket: int | None = None,
) -> StreamingQuery:
    """Streaming near-dup detection: emit (id_a, id_b) pairs of pages
    within `max_hamming` SimHash bits of each OTHER page seen in any
    micro-batch so far — the streaming leg of
    operators/dedup.simhash_near_pairs, pair-for-pair equal to running
    the batch operator over the union of all batches (tested).

    Shape mirrors the batch plan: the zero-shuffle fingerprint map, then
    banding on max_hamming+1 disjoint bit slices; state lives per
    (band, band_value) bucket and holds (id, fingerprint) — 60-bit
    longs + ids, never page bodies. Verification inside the bucket is
    exact full-fingerprint hamming, so pigeonhole recall 1.0 carries
    over. A pair agreeing on several bands is emitted once per such
    band (Spark disallows chaining another stateful dedup after
    applyInPandasWithState in append mode); the parquet sink is
    append-only, so consumers take DISTINCT (id_a, id_b) — same as the
    batch operator's pair-dedup before join-back.

    ``max_state_per_bucket``: None (default) = unbounded per-bucket
    history — exact batch parity, right for availableNow replays; a
    long-running 24/7 stream should set a cap, trading recall for O(cap)
    state and per-arrival work (see stateful.make_band_pairs_update for
    the precise recall caveat)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import _band_slices, simhash
    from .stateful import BAND_STATE_SCHEMA, PAIR_SCHEMA, make_band_pairs_update

    pages = read_pages_stream(spark, in_path)
    fp = simhash(pages, id_col="url", text_col="text")
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", sh)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("band_val"),
            )
            for i, (sh, w) in enumerate(_band_slices(max_hamming))
        ]
    )
    e = (
        fp.withColumn("_b", F.explode(bands))
        .select("id", "simhash", F.col("_b.band").alias("band"), F.col("_b.band_val").alias("band_val"))
    )
    pairs = e.groupBy("band", "band_val").applyInPandasWithState(
        make_band_pairs_update(max_hamming, max_state_per_bucket),
        PAIR_SCHEMA,
        BAND_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_minhash_incremental_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    state_dir: str,
    num_hashes: int | None = None,
    num_bands: int | None = None,
    jaccard_threshold: float = 0.7,
    max_files: int = 1,
) -> StreamingQuery:
    """Rolling-crawl near-dup dedup as a stream: each micro-batch of
    newly-landed pages is deduped against everything seen so far via
    the PERSISTED MinHash band index (operators/dedup.minhash_band_index
    — the index-once/query-many shape), then folded into it. The union
    of emitted pairs over all batches equals batch
    ``minhash_lsh_pairs`` over the union of all batches (tested): a
    pair is emitted exactly once, in the batch its LATER member
    arrives (so no cross-batch duplicate emission, unlike the
    per-band simhash stream).

    foreachBatch, not applyInPandasWithState: the exact-Jaccard verify
    needs candidate documents' shingles, which per-bucket operator
    state must not hold (document-sized state rows). Instead the
    stream's state is two parquet stores under ``state_dir``:

      index/batch=K/  (id, band, sig) — num_bands fixed-width rows per
                      doc, never text; read whole each batch (ids-only
                      band join, the scale path of the batch operator)
      docs/batch=K/   (id, text)      — read CANDIDATE-PRUNED only
                      (LEFT SEMI inside minhash_lsh_pairs_incremental);
                      the full corpus text is never re-shingled

    Batch K writes pairs to ``out_path/batch=K`` and its own rows to
    both stores with mode=overwrite, so a replayed micro-batch (Spark
    re-runs foreachBatch after a failure) rewrites the same paths —
    idempotent, matching the batch job's bucket-manifest discipline.
    State growth is the inverted file itself: O(num_bands) rows per
    document ever seen, the minimum any exact-dedup-against-history
    needs."""
    from ..operators.dedup import (
        NUM_BANDS,
        NUM_MINHASHES,
        minhash_band_index,
        minhash_lsh_pairs_incremental,
    )

    nh = NUM_MINHASHES if num_hashes is None else num_hashes
    nb = NUM_BANDS if num_bands is None else num_bands

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        s = bdf.sparkSession
        new_docs = bdf.select("url", F.coalesce("text", F.lit("")).alias("text"))
        try:
            docs_all = s.read.parquet(f"{state_dir}/docs")
            index_all = s.read.parquet(f"{state_dir}/index")
        except AnalysisException as e:
            # ONLY a missing path means "first batch". Any other read
            # failure (permissions, corrupt footer, transient FS error)
            # must FAIL the batch: swallowing it would silently dedup
            # against an empty corpus and permanently miss every
            # cross-batch pair of this batch once the checkpoint
            # commits.
            if "PATH_NOT_FOUND" not in str(e):
                raise
            docs_all = s.createDataFrame([], "url string, text string, batch int")
            index_all = s.createDataFrame(
                [], "id string, band int, sig long, batch int"
            )
        # The Spark checkpoint owns batch numbering; the state stores
        # belong to that checkpoint. A FRESH checkpoint over an old
        # state_dir would restart batch ids at 0, filter out the whole
        # persisted history ("batch < 0") and overwrite batch=0 in
        # place — a silently inconsistent index. Stale future batches
        # are detectable, so refuse loudly. (Replaying the CURRENT
        # batch after a crash is legal: its own partition overwrite is
        # the idempotency mechanism.)
        stale = (
            index_all.select(F.max("batch").alias("m")).collect()[0]["m"]
        )
        if stale is not None and stale > batch_id:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds batches up to "
                f"{stale} but this stream is at batch {batch_id}: the "
                "checkpoint and state_dir belong together — resume with "
                "the original checkpoint, or start with a fresh state_dir"
            )
        corpus = docs_all.where(F.col("batch") < batch_id).select("url", "text")
        index = index_all.where(F.col("batch") < batch_id).select(
            "id", "band", "sig"
        )
        pairs = minhash_lsh_pairs_incremental(
            new_docs,
            corpus,
            corpus_index=index,
            id_col="url",
            text_col="text",
            num_hashes=nh,
            num_bands=nb,
            jaccard_threshold=jaccard_threshold,
        )
        pairs.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        new_docs.write.mode("overwrite").parquet(
            f"{state_dir}/docs/batch={batch_id}"
        )
        minhash_band_index(
            new_docs, id_col="url", text_col="text",
            num_hashes=nh, num_bands=nb,
        ).write.mode("overwrite").parquet(f"{state_dir}/index/batch={batch_id}")

    pages = read_pages_stream(spark, in_path, max_files=max_files)
    return (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_crawl_diff_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    state_dir: str,
    max_files: int = 1,
) -> StreamingQuery:
    """Rolling-crawl change detection as a stream: each micro-batch of
    newly-crawled pages is classified added / changed / unchanged
    against the PERSISTED digest index of every url's most recent
    earlier crawl — the streaming front-end of operators/crawl.crawl_diff
    (a stream observes arrivals, so the batch diff's 'deleted' status
    has no streaming analogue). Emits one row (url, status, digest) per
    added/changed page to ``out_path/batch=K``; downstream feeds exactly
    those urls to extraction, completing the incremental chain
    diff -> extract (--diff-against) -> dedup (minhash incremental).

    State under ``state_dir/digests/batch=K`` is (url, 64-hex digest)
    only — never page bytes; ~80 bytes per crawl event, the minimum any
    diff-against-history needs. A url re-crawled in several batches is
    compared against its LATEST prior digest (max_by over the batch
    column). Writes are partition-overwrite, so a replayed micro-batch
    is idempotent, and a fresh checkpoint over stale state is refused
    loudly (same contract as start_minhash_incremental_stream)."""

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        s = bdf.sparkSession
        # NULL html digests to the same 'null' sentinel as batch
        # crawl_diff (stream==batch digest parity; see crawl.crawl_diff
        # on why NULL must not collide with sha2('')).
        digest = F.when(
            F.col("html").isNull(), F.lit("null")
        ).otherwise(F.sha2(F.col("html"), 256))
        # One digest per url per batch: a url crawled twice inside one
        # micro-batch keeps its latest fetch (deterministic (warc_ts,
        # digest) max — struct ordering breaks timestamp ties).
        new_digests = (
            bdf.select("url", F.struct("warc_ts", digest.alias("digest")).alias("_e"))
            .groupBy("url")
            .agg(F.max("_e").alias("_e"))
            .select("url", F.col("_e.digest").alias("digest"))
        )
        try:
            hist = s.read.parquet(f"{state_dir}/digests")
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            hist = s.createDataFrame([], "url string, digest string, batch int")
        stale = hist.select(F.max("batch").alias("m")).collect()[0]["m"]
        if stale is not None and stale > batch_id:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds batches up to "
                f"{stale} but this stream is at batch {batch_id}: resume "
                "with the original checkpoint, or start with a fresh "
                "state_dir"
            )
        prior = (
            hist.where(F.col("batch") < batch_id)
            .groupBy("url")
            .agg(F.max_by("digest", "batch").alias("prior_digest"))
        )
        out = (
            new_digests.join(prior, "url", "left")
            .select(
                "url",
                F.when(F.col("prior_digest").isNull(), F.lit("added"))
                .when(F.col("prior_digest") != F.col("digest"), F.lit("changed"))
                .otherwise(F.lit("unchanged"))
                .alias("status"),
                "digest",
            )
            .where(F.col("status") != "unchanged")
        )
        out.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        new_digests.write.mode("overwrite").parquet(
            f"{state_dir}/digests/batch={batch_id}"
        )

    pages = read_pages_stream(spark, in_path, max_files=max_files)
    return (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_pipeline_stream(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    checkpoint: str,
    state_dir: str,
    gate_quality: float | None = None,
    jaccard_threshold: float = 0.7,
    num_hashes: int | None = None,
    num_bands: int | None = None,
    max_files: int = 1,
) -> StreamingQuery:
    """The INCREMENTAL form of the full corpus pipeline (VERDICT r4 #7):
    each micro-batch of crawled pages runs
    digest-diff -> extraction -> quality gate -> incremental MinHash
    dedup against everything seen so far, composing the two existing
    streaming state stores (crawl-diff digests + minhash band index)
    into one chain; ``finalize_corpus_pipeline`` then produces the
    packed training sequences from the accumulated state, equal to the
    batch chain (extract -> gate -> pairs -> components -> keeper ->
    host cap -> chunk -> pack) over the LATEST version of every url
    (stream==batch parity test on a multi-batch fixture with re-crawls).

    Per batch K (all writes partition-overwrite => replay-idempotent;
    a fresh checkpoint over stale state is refused loudly, same
    contract as the component streams):
      1. collapse the batch to one row per url (latest (warc_ts,
         digest) fetch) and diff against ``state_dir/digests`` — only
         ADDED/CHANGED pages go further; unchanged re-crawls cost one
         digest compare, never extraction.
      2. extract_fused + gate (success, non-null body, optional
         quality_score >= gate_quality) -> gated docs
         (url, text) written to ``state_dir/docs/batch=K``.
      3. incremental near-dup pairs of the gated docs vs the LIVE
         corpus (latest version per url among earlier batches,
         excluding urls this batch replaces) via the persisted band
         index -> ``out_dir/pairs/batch=K``; the batch's own index
         rows fold into ``state_dir/index/batch=K``.

    State bound (documented contract): digests are ~80 B/url-crawl;
    docs hold (url, text) for gated documents only — the SAME store a
    batch pipeline's extracted output is, not extra streaming state;
    the index is num_bands fixed-width rows per gated doc. Everything
    else (components, caps, packing) is computed at finalize time from
    those stores — no unbounded operator state inside the stream.

    A pair emitted at batch K binds the versions current at K; when an
    endpoint url is later re-crawled CHANGED, the pair is superseded
    (the replacing batch re-pairs the new text against the live
    corpus) — finalize keeps a pair only if neither endpoint has a
    newer version, which is exactly the pair set the batch chain
    computes on the latest snapshot."""
    from ..operators.dedup import (
        NUM_BANDS,
        NUM_MINHASHES,
        minhash_band_index,
        minhash_lsh_pairs_incremental,
    )
    from ..plans.job import extract_fused

    nh = NUM_MINHASHES if num_hashes is None else num_hashes
    nb = NUM_BANDS if num_bands is None else num_bands

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        s = bdf.sparkSession

        def _state(path: str, schema: str) -> DataFrame:
            try:
                return s.read.parquet(path)
            except AnalysisException as e:
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                return s.createDataFrame([], schema)

        digest = F.when(F.col("html").isNull(), F.lit("null")).otherwise(
            F.sha2(F.col("html"), 256)
        )
        latest_fetch = (
            bdf.withColumn("_d", digest)
            .select("url", F.struct("warc_ts", F.col("_d").alias("digest"),
                                    "html").alias("_e"))
            .groupBy("url")
            .agg(F.max("_e").alias("_e"))
            .select("url", F.col("_e.digest").alias("digest"),
                    F.col("_e.html").alias("html"))
            .localCheckpoint(eager=True)
        )
        hist = _state(
            f"{state_dir}/digests", "url string, digest string, batch int"
        )
        stale = hist.select(F.max("batch").alias("m")).collect()[0]["m"]
        if stale is not None and stale > batch_id:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds batches up to "
                f"{stale} but this stream is at batch {batch_id}: resume "
                "with the original checkpoint, or start with a fresh "
                "state_dir"
            )
        prior = (
            hist.where(F.col("batch") < batch_id)
            .groupBy("url")
            .agg(F.max_by("digest", "batch").alias("prior_digest"))
        )
        work = latest_fetch.join(prior, "url", "left").where(
            F.col("prior_digest").isNull()
            | (F.col("prior_digest") != F.col("digest"))
        ).select("url", "html")
        ext = extract_fused(
            work.select(
                "url",
                F.lit(None).cast("timestamp").alias("warc_ts"),
                "html",
                F.lit("").alias("text"),
                F.lit(None).cast("string").alias("lang"),
            )
        )
        gate = F.col("success") & F.col("body_text").isNotNull()
        if gate_quality is not None:
            gate = gate & (F.col("quality_score") >= gate_quality)
        gated = ext.where(gate).select(
            "url", F.col("body_text").alias("text")
        ).localCheckpoint(eager=True)

        docs_all = _state(
            f"{state_dir}/docs", "url string, text string, batch int"
        )
        index_all = _state(
            f"{state_dir}/index", "id string, band int, sig long, batch int"
        )
        # LIVE corpus: latest version per url among earlier batches,
        # minus urls this batch REPLACES (their new text is in `gated`;
        # pairing new-vs-stale text of other urls would bind versions
        # the latest snapshot no longer has). Replaced = in `work`
        # (changed/added), NOT every url fetched this batch — a
        # digest-UNCHANGED re-crawl is still live with its old text,
        # and anti-joining it out would silently skip pairs between it
        # and this batch's new docs (stream==batch parity hole; caught
        # in round-5 review, regression-tested).
        latest = (
            docs_all.where(F.col("batch") < batch_id)
            .groupBy("url")
            .agg(F.max("batch").alias("_lb"))
            .join(work.select("url"), "url", "left_anti")
        )
        corpus = docs_all.join(latest, ["url"]).where(
            (F.col("batch") == F.col("_lb")) & F.col("text").isNotNull()
        ).select("url", "text")
        index = index_all.join(
            latest.withColumnRenamed("url", "id"), ["id"]
        ).where(F.col("batch") == F.col("_lb")).select("id", "band", "sig")
        pairs = minhash_lsh_pairs_incremental(
            gated, corpus, corpus_index=index, id_col="url",
            text_col="text", num_hashes=nh, num_bands=nb,
            jaccard_threshold=jaccard_threshold,
        )
        pairs.write.mode("overwrite").parquet(f"{out_dir}/pairs/batch={batch_id}")
        # TOMBSTONES: a changed/added url whose latest crawl FAILS the
        # gate must supersede any older gated version, or finalize's
        # last-writer-wins would resurrect stale text the batch chain
        # over the latest snapshot excludes (round-5 review catch).
        # A NULL-text row per gate-failing work url records the death;
        # corpus/finalize readers filter text IS NOT NULL.
        dead = (
            work.select("url")
            .join(gated.select("url"), "url", "left_anti")
            .select("url", F.lit(None).cast("string").alias("text"))
        )
        gated.unionByName(dead).write.mode("overwrite").parquet(
            f"{state_dir}/docs/batch={batch_id}"
        )
        minhash_band_index(
            gated, id_col="url", text_col="text",
            num_hashes=nh, num_bands=nb,
        ).write.mode("overwrite").parquet(f"{state_dir}/index/batch={batch_id}")
        latest_fetch.select("url", "digest").write.mode("overwrite").parquet(
            f"{state_dir}/digests/batch={batch_id}"
        )

    pages = read_pages_stream(spark, in_path, max_files=max_files)
    return (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def finalize_corpus_pipeline(
    spark: SparkSession,
    out_dir: str,
    state_dir: str,
    max_per_host: int | None = None,
    chunk_tokens: int = 512,
    chunk_stride: int | None = None,
    seq_len: int = 2048,
) -> dict:
    """Terminal pass of the streaming corpus pipeline: resolve the
    accumulated state (gated docs + incremental pair stream) into the
    packed training sequences — components, keeper filter, optional
    host cap, chunking, packing, all on the LATEST version of every
    url. Writes ``out_dir/packed`` and returns stage counts. Equal by
    construction to the batch chain over the latest snapshot: live
    docs are last-writer-wins per url; a pair survives only if neither
    endpoint changed after it was emitted (see
    start_corpus_pipeline_stream); the downstream operators are the
    exact batch ones. Cheap relative to the stream: it re-reads only
    ids/hashes/text already extracted — extraction and shingling are
    never repeated."""
    from ..operators.curation import chunk_documents, host_cap, pack_sequences
    from ..operators.dedup import connected_components
    from ..operators.hoststats import host_of

    docs_all = spark.read.parquet(f"{state_dir}/docs")
    live = (
        docs_all.groupBy("url")
        .agg(F.max("batch").alias("_lb"))
    )
    # NULL-text rows are tombstones (latest crawl failed the gate):
    # they win last-writer-wins so the url contributes no document and
    # its older pairs are superseded, matching the batch chain.
    docs = docs_all.join(live, ["url"]).where(
        (F.col("batch") == F.col("_lb")) & F.col("text").isNotNull()
    ).select("url", "text")
    pairs_all = spark.read.parquet(f"{out_dir}/pairs")
    lb_a = live.select(F.col("url").alias("id_a"), F.col("_lb").alias("_la"))
    lb_b = live.select(F.col("url").alias("id_b"), F.col("_lb").alias("_bb"))
    pairs = (
        pairs_all.join(lb_a, "id_a").join(lb_b, "id_b")
        .where((F.col("_la") <= F.col("batch")) & (F.col("_bb") <= F.col("batch")))
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    kept = docs.join(comp, docs["url"] == comp["doc_id"], "left").where(
        F.col("component_id").isNull() | (F.col("component_id") == F.col("url"))
    ).select("url", "text")
    if max_per_host is not None:
        kept = host_cap(
            kept.withColumn("host", host_of("url")),
            max_per_host, host_col="host", id_col="url",
        ).select("url", "text")
    stride = chunk_tokens if chunk_stride is None else chunk_stride
    chunks = chunk_documents(
        kept, id_col="url", text_col="text",
        chunk_tokens=chunk_tokens, stride=stride,
    )
    packed = pack_sequences(chunks, seq_len=seq_len, id_col="url")
    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")
    out = spark.read.parquet(f"{out_dir}/packed")
    n_pieces = out.count()
    return {
        "packed_dir": f"{out_dir}/packed",
        "packed_pieces": n_pieces,
        "packed_sequences": out.select("seq_id").distinct().count(),
        "live_docs": docs.count(),
        "live_pairs": pairs.count(),
    }


def start_quality_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    model_path: str,
    n_buckets: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Model SERVING on the crawl stream: extract each micro-batch and
    score it under a PERSISTED quality-classifier model (the
    <out>/quality_model parquet run_quality writes) — the streaming
    half of the classifier's train/serve split. Training stays a batch
    job (class counts need the whole corpus); serving is embarrassingly
    per-document, so the stream scores pages as they arrive and appends
    (url, n_terms, score, keep) rows exactly-once via the checkpoint.

    The model is read ONCE at stream start and broadcast into every
    micro-batch (it is <= n_buckets rows by construction); a model
    refresh is a stream restart — the honest contract, since silently
    hot-swapping scoring mid-stream would make batch boundaries change
    semantics. n_buckets defaults to the model's own row count (the
    spine is complete by construction), so a serving mismatch cannot
    be configured accidentally; passing an explicit value keeps the
    in-plan mismatch guard armed."""
    from ..operators.classifier import nb_score
    from ..plans.job import extract_fused

    model = spark.read.parquet(model_path)
    nb = model.count() if n_buckets is None else n_buckets
    pages = read_pages_stream(spark, in_path)

    checked = {"done": False}

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        s = bdf.sparkSession
        # Refuse a fresh checkpoint over an out_path already holding
        # later batches: the overwrite would silently mix scores from
        # two different runs/models (sibling-stream contract). Checked
        # ONCE per stream start — within a run the prior max is always
        # batch_id - 1, and re-scanning the whole (linearly growing)
        # output directory per micro-batch would cost O(batches^2)
        # cumulative metadata reads on the hot path.
        if not checked["done"]:
            checked["done"] = True
            try:
                prior = s.read.option("basePath", out_path).parquet(out_path)
                stale = prior.select(F.max("batch").alias("m")).collect()[0]["m"]
            except AnalysisException as e:
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                stale = None
            if stale is not None and stale > batch_id:
                raise RuntimeError(
                    f"out_path {out_path!r} already holds batches up to "
                    f"{stale} but this stream is at batch {batch_id}: "
                    "resume with the original checkpoint, or score into "
                    "a fresh out_path"
                )
        ext = extract_fused(bdf)
        docs = ext.where(
            F.col("success") & F.col("body_text").isNotNull()
        ).select(F.col("url").alias("doc_id"), F.col("body_text").alias("text"))
        # collapse within-batch url duplicates to the batch side's
        # deterministic representative (_curation_docs min_by rule) —
        # two fetches of one url must not double its term counts or
        # emit two score rows (same rule as the bm25 index stream).
        docs = docs.groupBy("doc_id").agg(
            F.expr("min_by(text, md5(text))").alias("text")
        )
        scored = nb_score(docs, model, n_buckets=nb).select(
            F.col("doc_id").alias("url"), "n_terms", "score", "keep"
        )
        scored.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    writer = (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_bm25_index_stream(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    state_dir: str,
    max_files: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental BM25 index maintenance: each micro-batch of crawled
    pages is extracted and its inverted-file rows (term, url, tf, dl —
    operators/search.bm25_index) appended under
    ``state_dir/index/batch=K`` — the streaming form of the
    index-once/query-many serving mode, for a rolling crawl that must
    stay searchable without ever re-tokenizing the corpus.

    Re-crawls: a url indexed in several batches keeps ALL its batch
    slices in state; bm25_index_snapshot() resolves latest-version-wins
    at read time (the same latest-prior rule as the crawl-diff stream,
    pushed to the consumer so the per-batch write stays a blind
    partition overwrite — replay-idempotent, no read-modify-write race
    on the hot index). Rows are terms and counts only, never document
    text. A fresh checkpoint over stale state is refused loudly (same
    contract as the sibling streams)."""

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..operators.search import bm25_index

        s = bdf.sparkSession
        try:
            hist = s.read.parquet(f"{state_dir}/index")
            stale = hist.select(F.max("batch").alias("m")).collect()[0]["m"]
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            stale = None
        if stale is not None and stale > batch_id:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds batches up to "
                f"{stale} but this stream is at batch {batch_id}: resume "
                "with the original checkpoint, or start with a fresh "
                "state_dir"
            )
        ext = extract_fused(bdf)
        docs = ext.where(
            F.col("success") & F.col("body_text").isNotNull()
        ).select(F.col("url").alias("doc_id"), F.col("body_text").alias("text"))
        # one row per url per batch: a url crawled twice inside one
        # micro-batch collapses to the SAME deterministic
        # representative the batch side uses (_curation_docs: lowest
        # body hash via min_by) — so stream and batch index the
        # identical text for any duplicated url.
        docs = docs.groupBy("doc_id").agg(
            F.expr("min_by(text, md5(text))").alias("text")
        )
        bm25_index(docs).write.mode("overwrite").parquet(
            f"{state_dir}/index/batch={batch_id}"
        )

    writer = (
        read_pages_stream(spark, in_path, max_files=max_files)
        .writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bm25_index_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The serveable view of the streamed BM25 index: every url's rows
    from its LATEST batch only (a re-crawl fully replaces the url's
    old posting rows — document lengths change, so partial merges
    would corrupt dl). Ids+batch only through the resolve join; feed
    the result to bm25_topk(..., index=) to answer queries."""
    hist = spark.read.parquet(f"{state_dir}/index")
    latest = hist.groupBy("doc_id").agg(F.max("batch").alias("batch"))
    return hist.join(latest, ["doc_id", "batch"]).select(
        "term", "doc_id", "tf", "dl"
    )


def start_components_stream(
    spark: SparkSession,
    pairs_path: str,
    checkpoint: str,
    state_dir: str,
    max_files: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental duplicate-cluster labels as a stream: consume
    near-dup PAIR batches (e.g. the parquet directory
    start_minhash_incremental_stream emits) and maintain a complete
    (doc_id, component_id) label table under
    ``state_dir/labels/batch=K`` via dedup.merge_components — so the
    keeper decision for a rolling crawl is always one read away,
    without ever re-running CC over the full pair history. Each
    batch's state write is the full current label table (labels exist
    only for docs in some duplicate group — bounded by duplicated
    docs, not pairs, and far below corpus size in practice).

    Exactly-once: per-batch overwrite + Spark's checkpoint; a replayed
    micro-batch rewrites identical labels (merge_components is
    deterministic). A fresh checkpoint over stale state is refused
    loudly (sibling-stream contract)."""

    def _one_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..operators.dedup import connected_components, merge_components

        s = bdf.sparkSession
        try:
            hist = s.read.parquet(f"{state_dir}/labels")
            stale = hist.select(F.max("batch").alias("m")).collect()[0]["m"]
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            hist, stale = None, None
        if stale is not None and stale > batch_id:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds batches up to "
                f"{stale} but this stream is at batch {batch_id}: resume "
                "with the original checkpoint, or start with a fresh "
                "state_dir"
            )
        pairs = bdf.select("id_a", "id_b")
        if hist is None or stale is None:
            labels = connected_components(pairs)
        else:
            prior = (
                hist.where(F.col("batch") < batch_id)
                .groupBy("doc_id")
                .agg(F.max_by("component_id", "batch").alias("component_id"))
            )
            labels = merge_components(prior, pairs)
        labels.write.mode("overwrite").parquet(
            f"{state_dir}/labels/batch={batch_id}"
        )

    reader = (
        spark.readStream.schema("id_a string, id_b string")
        .option("maxFilesPerTrigger", max_files)
        .parquet(pairs_path)
    )
    writer = reader.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def components_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The serveable label view of the streamed components: each doc's
    label from its LATEST batch (later batches rewrite the full table,
    so latest-wins is exact, not a merge)."""
    hist = spark.read.parquet(f"{state_dir}/labels")
    return hist.groupBy("doc_id").agg(
        F.max_by("component_id", "batch").alias("component_id")
    )
