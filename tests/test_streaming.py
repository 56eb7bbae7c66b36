"""Streaming variant: availableNow extraction stream over fixture pages
equals the batch fused output; stateful windowed throughput agg runs."""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_poc_spark.fixtures import gen_pages
from ocr_poc_spark.plans.job import extract_fused
from ocr_poc_spark.streaming.stream_job import (
    start_extraction_stream,
    start_throughput_stream,
)


def _write_pages_dir(rows, path):
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(table.slice(0, len(rows) // 2), f"{path}/part-0.parquet")
    pq.write_table(table.slice(len(rows) // 2), f"{path}/part-1.parquet")


def test_stream_equals_batch(spark, tmp_path):
    rows = gen_pages(60, seed=7)
    in_dir = str(tmp_path / "pages")
    _write_pages_dir(rows, in_dir)

    q = start_extraction_stream(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        r["url"]: (r["success"], r["body_text"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    exp = {
        r["url"]: (r["success"], r["body_text"])
        for r in extract_fused(spark.read.parquet(in_dir)).collect()
    }
    assert got == exp and len(got) == 60


def test_throughput_window_agg(spark, tmp_path):
    rows = gen_pages(40, seed=9)
    in_dir = str(tmp_path / "pages")
    _write_pages_dir(rows, in_dir)
    q = start_throughput_stream(
        spark, in_dir, str(tmp_path / "ckpt2"), query_name="tp_test"
    )
    q.awaitTermination(120)
    # update mode: one row per window UPDATE -> take the latest count per
    # (window, lang); their sum must cover every ingested page exactly.
    agg = spark.sql(
        """select sum(n) as n from (
             select max(n_docs) as n from tp_test group by window, lang)"""
    ).collect()[0]["n"]
    assert agg == 40


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: totals accumulate across micro-batches
    (maxFilesPerTrigger=1 -> one batch per input file)."""
    import pyspark.sql.functions as F

    from ocr_poc_spark.schemas import PAGES_SCHEMA
    from ocr_poc_spark.streaming.stateful import running_ingest_totals

    rows = gen_pages(50, seed=11)
    in_dir = str(tmp_path / "pages")
    _write_pages_dir(rows, in_dir)  # two part files -> two micro-batches

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_ingest_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from totals").collect()
    # final running total per lang == batch-count sum == true count
    import collections

    true_counts = collections.Counter(r["lang"] for r in rows)
    true_bytes = collections.Counter()
    for r in rows:
        true_bytes[r["lang"]] += len(r["html"])
    finals = {}
    batch_sums = collections.Counter()
    for r in out:
        finals[r["lang"]] = max(finals.get(r["lang"], 0), r["total_docs"])
        batch_sums[r["lang"]] += r["batch_docs"]
    assert finals == dict(true_counts)
    assert dict(batch_sums) == dict(true_counts)
    by_lang_bytes = {
        r["lang"]: r["total_bytes"]
        for r in out
        if r["total_docs"] == finals[r["lang"]]
    }
    assert by_lang_bytes == dict(true_bytes)
    # state actually crossed batches: some lang saw >1 micro-batch row
    assert any(
        sum(1 for r in out if r["lang"] == lang) > 1 for lang in finals
    )


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Cross-batch dedup state: a page whose text digest appeared in an
    EARLIER micro-batch file must be dropped when it re-arrives later
    (maxFilesPerTrigger=16 still processes files in order within the
    availableNow run; the state store carries digests between them)."""
    from ocr_poc_spark.streaming.stream_job import start_dedup_stream

    rows = gen_pages(30, seed=11)
    for i, r in enumerate(rows):
        r["text"] = f"unique text {i}" if i % 3 else "repeated text body"
    in_dir = str(tmp_path / "in")
    _write_pages_dir(rows, in_dir)  # two files, repeats span both

    out = str(tmp_path / "out")
    q = start_dedup_stream(spark, in_dir, out, str(tmp_path / "ck"))
    q.awaitTermination()
    got = spark.read.parquet(out).select("url", "text").collect()
    texts = [r["text"] for r in got]
    assert texts.count("repeated text body") == 1          # one survivor
    n_unique_expected = len({r["text"] for r in rows})
    assert len(got) == n_unique_expected


def test_stream_simhash_pairs_equal_batch(spark, tmp_path):
    """Streaming curation parity for the simhash method: the pair set
    emitted across two micro-batch files (near-dups WITHIN a batch and
    ACROSS the batch boundary) equals batch simhash_near_pairs over the
    union of both batches."""
    from ocr_poc_spark.operators.dedup import simhash_near_pairs
    from ocr_poc_spark.streaming.stream_job import start_simhash_pairs_stream

    rows = gen_pages(40, seed=13)
    base = "the quick brown fox jumps over the lazy dog " * 8
    for i, r in enumerate(rows):
        if i in (0, 21):          # near-identical pair SPLIT across files
            r["text"] = base + ("extra tail" if i == 21 else "")
        elif i in (2, 4):         # near-identical pair within file 0
            r["text"] = base.replace("fox", "cat") + ("x" if i == 4 else "")
        else:
            r["text"] = f"unique body {i} " + " ".join(
                f"w{i}t{j}" for j in range(30)
            )
    in_dir = str(tmp_path / "in")
    _write_pages_dir(rows, in_dir)  # file 0 = rows[:20], file 1 = rows[20:]

    out = str(tmp_path / "out")
    q = start_simhash_pairs_stream(
        spark, in_dir, out, str(tmp_path / "ck"), max_hamming=4
    )
    q.awaitTermination()
    stream_pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(out).collect()
    }

    batch = spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            batch, id_col="url", text_col="text", max_hamming=4
        ).collect()
    }
    assert stream_pairs == batch_pairs
    # both planted pairs actually found (cross-batch and within-batch)
    urls = [r["url"] for r in rows]
    assert tuple(sorted((urls[0], urls[21]))) in stream_pairs
    assert tuple(sorted((urls[2], urls[4]))) in stream_pairs


def test_band_pairs_update_state_cap():
    """Capped per-bucket state: only the most recent N (id, fp) entries
    survive, so a pair separated by > N same-bucket arrivals is missed
    (documented recall trade) while state stays O(N)."""
    import pandas as pd

    from ocr_poc_spark.streaming.stateful import make_band_pairs_update

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def run(update, batches, state):
        out = []
        for b in batches:
            for pdf in update((0, 0), [pd.DataFrame(b)], state):
                out.extend(zip(pdf["id_a"], pdf["id_b"]))
        return out

    batches = [
        {"id": ["a"], "simhash": [0]},
        {"id": ["x1"], "simhash": [(1 << 20) - 1]},         # 20 bits from a
        {"id": ["x2"], "simhash": [((1 << 20) - 1) << 20]},  # 20+ bits from both
        {"id": ["b"], "simhash": [0]},         # dup of a, 3 arrivals later
    ]
    uncapped_state = _FakeState()
    assert run(make_band_pairs_update(3), batches, uncapped_state) == [("a", "b")]
    assert len(uncapped_state.get[0]) == 4

    capped_state = _FakeState()
    assert run(make_band_pairs_update(3, max_state_per_bucket=2), batches, capped_state) == []
    assert len(capped_state.get[0]) == 2  # only the 2 most recent retained


def test_stream_minhash_incremental_equals_batch(spark, tmp_path):
    """Rolling-crawl dedup stream over THREE micro-batch files (forced
    by maxFilesPerTrigger=1): the union of emitted pairs must equal
    batch minhash_lsh_pairs over the union of all batches — near-dups
    within one batch, across adjacent batches, and across batches 0->2
    all found via the persisted band index, with no duplicate
    emissions. Also pins the persisted-state layout (num_bands index
    rows per doc, per-batch partitions)."""
    import os

    from ocr_poc_spark.operators.dedup import NUM_BANDS, minhash_lsh_pairs
    from ocr_poc_spark.streaming.stream_job import (
        start_minhash_incremental_stream,
    )

    rows = gen_pages(30, seed=7)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    for i, r in enumerate(rows):
        if i in (1, 11):        # pair across batches 0 -> 1
            r["text"] = base + ("tail one" if i == 11 else "")
        elif i in (3, 24):      # pair across batches 0 -> 2
            r["text"] = base.replace("alpha", "omega") + ("x" if i == 24 else "")
        elif i in (21, 23):     # pair within batch 2
            r["text"] = base.replace("beta", "mu") + ("y" if i == 23 else "")
        else:
            r["text"] = f"unique body {i} " + " ".join(
                f"w{i}t{j}" for j in range(40)
            )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for b in range(3):  # 3 files of 10 rows -> 3 micro-batches
        chunk = rows[b * 10 : (b + 1) * 10]
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in chunk], pa.string()),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in chunk], pa.timestamp("us", tz="UTC")
                    ),
                    "html": pa.array([r["html"] for r in chunk], pa.binary()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                    "lang": pa.array([r["lang"] for r in chunk], pa.string()),
                }
            ),
            f"{in_dir}/part-{b}.parquet",
        )

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    q = start_minhash_incremental_stream(
        spark, in_dir, out, str(tmp_path / "ck"), state,
        jaccard_threshold=0.5, max_files=1,
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out).select("id_a", "id_b").collect()
    stream_pairs = [(r["id_a"], r["id_b"]) for r in emitted]
    assert len(stream_pairs) == len(set(stream_pairs))  # no dup emissions

    batch = spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            batch, id_col="url", text_col="text", jaccard_threshold=0.5
        ).collect()
    }
    assert set(stream_pairs) == batch_pairs
    urls = [r["url"] for r in rows]
    for a, b in [(1, 11), (3, 24), (21, 23)]:
        assert tuple(sorted((urls[a], urls[b]))) in batch_pairs

    # persisted state: 3 batch partitions each in docs/ and index/,
    # index carries NUM_BANDS rows per doc and never text
    idx = spark.read.parquet(f"{state}/index")
    assert sorted(r["batch"] for r in idx.select("batch").distinct().collect()) == [0, 1, 2]
    assert idx.count() == 30 * NUM_BANDS
    assert set(idx.columns) == {"id", "band", "sig", "batch"}


def test_stream_minhash_incremental_restart_catches_up(spark, tmp_path):
    """Rolling-crawl restart: after the stream drains batches 0-1 and
    stops, a NEW crawl file lands and the stream restarts on the SAME
    checkpoint — it must process only the new file (availableNow +
    offset log), dedup it against the PERSISTED state of earlier
    batches, and leave earlier outputs untouched."""
    import os

    from ocr_poc_spark.streaming.stream_job import (
        start_minhash_incremental_stream,
    )

    base = "gamma delta epsilon zeta eta theta iota kappa lambda mu " * 6
    rows = gen_pages(30, seed=19)
    for i, r in enumerate(rows):
        if i in (2, 25):       # pair: batch 0 vs the late-arriving file
            r["text"] = base + ("later tail" if i == 25 else "")
        else:
            r["text"] = f"unique body {i} " + " ".join(
                f"w{i}t{j}" for j in range(40)
            )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def _write(chunk, name):
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in chunk], pa.string()),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in chunk], pa.timestamp("us", tz="UTC")
                    ),
                    "html": pa.array([r["html"] for r in chunk], pa.binary()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                    "lang": pa.array([r["lang"] for r in chunk], pa.string()),
                }
            ),
            f"{in_dir}/{name}",
        )

    _write(rows[:10], "part-0.parquet")
    _write(rows[10:20], "part-1.parquet")

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    q = start_minhash_incremental_stream(
        spark, in_dir, out, ck, state, jaccard_threshold=0.5, max_files=1
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 0  # no pairs yet
    batches_before = {
        r["batch"]
        for r in spark.read.parquet(f"{state}/index").select("batch").distinct().collect()
    }
    assert batches_before == {0, 1}

    # new crawl lands; restart on the same checkpoint
    _write(rows[20:], "part-2.parquet")
    q2 = start_minhash_incremental_stream(
        spark, in_dir, out, ck, state, jaccard_threshold=0.5, max_files=1
    )
    q2.awaitTermination()

    pairs = sorted(
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()
    )
    urls = [r["url"] for r in rows]
    assert pairs == [tuple(sorted((urls[2], urls[25])))]
    idx = spark.read.parquet(f"{state}/index")
    assert sorted(
        r["batch"] for r in idx.select("batch").distinct().collect()
    ) == [0, 1, 2]
    # earlier batches' index rows untouched by the catch-up run
    from ocr_poc_spark.operators.dedup import NUM_BANDS

    assert idx.where("batch < 2").count() == 20 * NUM_BANDS


def test_stream_minhash_incremental_refuses_stale_state(spark, tmp_path):
    """A FRESH checkpoint over an old state_dir restarts batch ids at 0
    and would silently overwrite/ignore persisted history — the stream
    must refuse loudly instead."""
    import os

    import pytest

    from ocr_poc_spark.streaming.stream_job import (
        start_minhash_incremental_stream,
    )

    rows = gen_pages(20, seed=23)
    for i, r in enumerate(rows):
        r["text"] = f"body {i} " + " ".join(f"w{i}x{j}" for j in range(30))
    in_dir = str(tmp_path / "in")
    _write_pages_dir(rows, in_dir)  # two files -> two batches

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    q = start_minhash_incremental_stream(
        spark, in_dir, out, str(tmp_path / "ck1"), state, max_files=1
    )
    q.awaitTermination()
    assert os.path.isdir(f"{state}/index/batch=1")

    q2 = start_minhash_incremental_stream(
        spark, in_dir, out, str(tmp_path / "ck2"), state, max_files=1
    )
    with pytest.raises(Exception, match="belong together"):
        q2.awaitTermination()
        raise RuntimeError(q2.exception() or "stream succeeded unexpectedly")


def test_stream_crawl_diff_statuses_and_state(spark, tmp_path):
    """Rolling-crawl change detection over THREE micro-batches: first
    sight of a url is 'added', a re-crawl with different html bytes is
    'changed' (vs the LATEST prior digest), identical re-crawls emit
    nothing; state holds (url, digest, batch) rows only."""
    import os

    from ocr_poc_spark.streaming.stream_job import start_crawl_diff_stream

    rows = gen_pages(9, seed=3)
    # script the scenario on top of the fixture rows:
    #   batch 0: A v1, B v1, X        batch 1: A v1 (same), C, Y
    #   batch 2: A v2, B v2, Z
    script = [
        ("A", b"<html>a v1</html>"), ("B", b"<html>b v1</html>"), ("X", b"<html>x</html>"),
        ("A", b"<html>a v1</html>"), ("C", b"<html>c</html>"), ("Y", b"<html>y</html>"),
        ("A", b"<html>a v2</html>"), ("B", b"<html>b v2</html>"), ("Z", b"<html>z</html>"),
    ]
    for r, (u, h) in zip(rows, script):
        r["url"], r["html"] = u, h
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for b in range(3):
        chunk = rows[b * 3 : (b + 1) * 3]
        path = f"{in_dir}/part-{b}.parquet"
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in chunk], pa.string()),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in chunk], pa.timestamp("us", tz="UTC")
                    ),
                    "html": pa.array([r["html"] for r in chunk], pa.binary()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                    "lang": pa.array([r["lang"] for r in chunk], pa.string()),
                }
            ),
            path,
        )
        # FileStreamSource picks files by MODIFICATION TIME under
        # maxFilesPerTrigger; three files written back-to-back collide
        # at mtime granularity and the batch order flips run to run.
        # A rolling crawl's batch order is its arrival order — pin it.
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    q = start_crawl_diff_stream(
        spark, in_dir, out, str(tmp_path / "ck"), state, max_files=1
    )
    q.awaitTermination()

    got = {
        (r["batch"], r["url"]): r["status"]
        for r in spark.read.option("basePath", out).parquet(out).collect()
    }
    assert got == {
        (0, "A"): "added", (0, "B"): "added", (0, "X"): "added",
        # batch 1: A unchanged (not emitted), C and Y new
        (1, "C"): "added", (1, "Y"): "added",
        (2, "A"): "changed", (2, "B"): "changed", (2, "Z"): "added",
    }

    hist = spark.read.parquet(f"{state}/digests")
    assert set(hist.columns) == {"url", "digest", "batch"}
    assert hist.count() == 9
    assert sorted(
        r["batch"] for r in hist.select("batch").distinct().collect()
    ) == [0, 1, 2]


def test_stream_corpus_pipeline_equals_batch(spark, tmp_path):
    """Composed incremental corpus pipeline (digest diff -> extract ->
    gate -> incremental minhash vs the persisted band index) over THREE
    micro-batches plus finalize must equal the batch chain
    (extract -> gate -> pairs -> components -> keeper -> host cap ->
    chunk -> pack) over the LATEST version of every url. The fixture
    exercises: a cross-batch exact dup (0->1), a changed re-crawl whose
    old version had a pair (the pair must be superseded), an in-batch
    dup created by the re-crawl, an unchanged re-crawl (digest-skipped,
    no second doc version) whose text near-dups a NEW same-batch doc
    (the unchanged url must stay in the live pairing corpus — round-5
    review regression), and a changed re-crawl that FAILS the gate
    (must tombstone the url, not resurrect its older gated version —
    round-5 review regression)."""
    import os

    from ocr_poc_spark.operators.curation import (
        chunk_documents,
        host_cap,
        pack_sequences,
    )
    from ocr_poc_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from ocr_poc_spark.operators.hoststats import host_of
    from ocr_poc_spark.streaming.stream_job import (
        finalize_corpus_pipeline,
        start_corpus_pipeline_stream,
    )
    import pyspark.sql.functions as F

    rows = [r for r in gen_pages(60, seed=7)
            if bytes(r["html"]).lstrip()[:1] == b"<"][:36]
    assert len(rows) == 36
    b0, b1, b2 = rows[:12], rows[12:24], rows[24:36]
    b1[1]["html"] = b0[1]["html"]     # cross-batch dup (different urls)
    b1[0]["html"] = b0[0]["html"]     # dup of u0's ORIGINAL version
    # batch 2: u0 re-crawled CHANGED (same body as b2[7] -> in-batch
    # pair with it), u2 re-crawled UNCHANGED.
    recrawl_changed = dict(b0[0], html=b2[7]["html"])
    recrawl_same = dict(b0[2])
    # NEW url whose body duplicates the UNCHANGED re-crawl's: the pair
    # (u2, dup_of_unchanged) only exists if u2 stays in the live
    # pairing corpus despite being fetched (unchanged) this batch.
    dup_of_unchanged = dict(
        b0[2], url="https://mirror-u2.example/copy"
    )
    # u3 re-crawled with a payload that FAILS extraction: the batch
    # chain drops u3 entirely; the stream must tombstone it.
    recrawl_failed = dict(b0[3], html=b"%RAISE-TEST% changed payload")
    batch2 = b2 + [recrawl_changed, recrawl_same, dup_of_unchanged,
                   recrawl_failed]

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, chunk in enumerate([b0, b1, batch2]):
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in chunk], pa.string()),
                    "warc_ts": pa.array([r["warc_ts"] for r in chunk],
                                        pa.timestamp("us", tz="UTC")),
                    "html": pa.array([bytes(r["html"]) for r in chunk],
                                     pa.binary()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                    "lang": pa.array([r["lang"] for r in chunk], pa.string()),
                }
            ),
            f"{in_dir}/part-{i}.parquet",
        )

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    q = start_corpus_pipeline_stream(
        spark, in_dir, out, str(tmp_path / "ck"), state,
        jaccard_threshold=0.5, max_files=1,
    )
    q.awaitTermination()
    res = finalize_corpus_pipeline(
        spark, out, state, max_per_host=6, chunk_tokens=16, seq_len=40,
    )

    u0, u2, u12 = b0[0]["url"], b0[2]["url"], b1[0]["url"]
    u3 = b0[3]["url"]
    # unchanged re-crawl skipped: u2 has exactly one doc version
    docs_state = spark.read.parquet(f"{state}/docs")
    assert docs_state.where(F.col("url") == u2).count() == 1
    # changed re-crawl: two versions, live one from batch 2
    assert docs_state.where(F.col("url") == u0).count() == 2
    # gate-failing re-crawl: the batch-2 row is a NULL-text tombstone
    u3_rows = docs_state.where(F.col("url") == u3).collect()
    assert {r["batch"] for r in u3_rows} == {0, 2}
    assert [r["text"] for r in u3_rows if r["batch"] == 2] == [None]
    # the stale pair (u0-old ~ u12) WAS emitted at batch 1...
    emitted = {(r["id_a"], r["id_b"], r["batch"])
               for r in spark.read.parquet(f"{out}/pairs").collect()}
    stale_pair = tuple(sorted((u0, u12)))
    assert any((a, b) == stale_pair and k == 1 for a, b, k in emitted)
    # ...and the unchanged-re-crawl pair (u2 ~ its new mirror) was
    # emitted at batch 2: u2 stayed in the live pairing corpus.
    unchanged_pair = tuple(sorted((u2, dup_of_unchanged["url"])))
    assert any((a, b) == unchanged_pair and k == 2 for a, b, k in emitted)

    # batch chain over the latest snapshot (u3's latest version is the
    # failing payload — include it; the gate drops it there)
    latest = (
        [r for r in b0[1:] if r["url"] != u3]
        + b1 + b2
        + [recrawl_changed, dup_of_unchanged, recrawl_failed]
    )
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
         for r in latest],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    ext = extract_fused(pages)
    gated = ext.where(
        F.col("success") & F.col("body_text").isNotNull()
    ).select("url", F.col("body_text").alias("text"))
    pairs = minhash_lsh_pairs(
        gated, id_col="url", text_col="text", jaccard_threshold=0.5
    )
    comp = connected_components(pairs.select("id_a", "id_b"))
    kept = gated.join(comp, gated["url"] == comp["doc_id"], "left").where(
        F.col("component_id").isNull()
        | (F.col("component_id") == F.col("url"))
    ).select("url", "text")
    capped = host_cap(
        kept.withColumn("host", host_of("url")), 6,
        host_col="host", id_col="url",
    ).select("url", "text")
    chunks = chunk_documents(
        capped, id_col="url", text_col="text", chunk_tokens=16, stride=16
    )
    batch_packed = pack_sequences(chunks, seq_len=40, id_col="url")

    # live doc count == the batch gate's survivor count (one row per
    # url; re-crawled versions collapsed to the latest)
    assert res["live_docs"] == gated.count()
    cols = ["seq_id", "tok_start", "tok_end", "url", "chunk_idx",
            "chunk_tok_start", "chunk_tok_end"]
    got = sorted(tuple(r) for r in
                 spark.read.parquet(res["packed_dir"]).select(*cols).collect())
    want = sorted(tuple(r) for r in batch_packed.select(*cols).collect())
    assert got == want and len(got) > 0
    # the superseded pair is NOT in the batch pair set; the in-batch
    # re-crawl pair IS
    batch_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert stale_pair not in batch_pairs
    assert tuple(sorted((u0, b2[7]["url"]))) in batch_pairs


def test_stream_quality_serving_equals_batch(spark, tmp_path):
    """Classifier SERVING on the stream: scores under a persisted model
    must equal the batch nb_score over the union of all micro-batches
    (training is batch-only; serving is per-document, so streaming it
    changes nothing) — and the model's n_buckets is self-derived from
    the persisted spine, so a serving mismatch cannot be configured by
    default."""
    import pyspark.sql.functions as F

    from ocr_poc_spark.operators.classifier import nb_score, nb_train
    from ocr_poc_spark.streaming.stream_job import start_quality_stream

    rows = gen_pages(60, seed=11)
    # a url fetched TWICE in one micro-batch (different bytes): the
    # stream must collapse to the batch side's min_by representative,
    # not double-count terms or emit two score rows.
    dup = dict(rows[0])
    dup["html"] = rows[1]["html"]
    rows.insert(1, dup)
    in_dir = str(tmp_path / "pages")
    _write_pages_dir(rows, in_dir)

    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
         for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    docs = extract_fused(pages).where(
        F.col("success") & F.col("body_text").isNotNull()
    ).select(F.col("url").alias("doc_id"), F.col("body_text").alias("text"))
    docs = docs.groupBy("doc_id").agg(
        F.expr("min_by(text, md5(text))").alias("text")
    )
    # train on a deterministic slice as the positive class
    pos = docs.where(F.crc32("doc_id") % 3 == 0)
    neg = docs.where(F.crc32("doc_id") % 3 != 0)
    model_path = str(tmp_path / "model")
    nb_train(pos, neg, n_buckets=1024).write.parquet(model_path)

    q = start_quality_stream(
        spark, in_dir, str(tmp_path / "scored"), str(tmp_path / "ck"),
        model_path,
    )
    q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scored")).select(
            "url", "n_terms", "score", "keep"
        ).collect()
    )
    model = spark.read.parquet(model_path)
    want = sorted(
        tuple(r)
        for r in nb_score(docs, model, n_buckets=1024).select(
            F.col("doc_id").alias("url"), "n_terms", "score", "keep"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_bm25_index_equals_batch(spark, tmp_path):
    """Incremental BM25 index: after 3 micro-batches (one url
    re-crawled with different content in the last batch), the
    snapshot's posting rows equal a batch bm25_index over the
    latest-version-wins union, and serving a query from the streamed
    snapshot equals serving it from the batch index."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from ocr_poc_spark.operators.search import bm25_index, bm25_topk
    from ocr_poc_spark.streaming.stream_job import (
        bm25_index_snapshot, start_bm25_index_stream,
    )

    rows = gen_pages(30, seed=5)
    pages_all = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
         for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    ok_urls = {
        r["url"]
        for r in extract_fused(pages_all)
        .where(F.col("success") & F.col("body_text").isNotNull())
        .select("url").collect()
    }
    first = next(i for i in range(10) if rows[i]["url"] in ok_urls)
    last = next(i for i in range(29, 19, -1) if rows[i]["url"] in ok_urls)
    # re-crawl: batch 2 fetches batch 0's url with DIFFERENT html
    rows[last]["url"] = rows[first]["url"]

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for b in range(3):
        chunk = rows[b * 10 : (b + 1) * 10]
        path = f"{in_dir}/part-{b}.parquet"
        pq.write_table(
            pa.table({
                "url": pa.array([r["url"] for r in chunk], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in chunk],
                                    pa.timestamp("us", tz="UTC")),
                "html": pa.array([r["html"] for r in chunk], pa.binary()),
                "text": pa.array([r["text"] for r in chunk], pa.string()),
                "lang": pa.array([r["lang"] for r in chunk], pa.string()),
            }),
            path,
        )
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))

    state = str(tmp_path / "state")
    q = start_bm25_index_stream(
        spark, in_dir, str(tmp_path / "ck"), state, max_files=1
    )
    q.awaitTermination(240)

    snap = bm25_index_snapshot(spark, state)

    # batch mirror: latest version wins -> drop the superseded page row
    latest_rows = [r for i, r in enumerate(rows) if i != first]
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
         for r in latest_rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    docs = extract_fused(pages).where(
        F.col("success") & F.col("body_text").isNotNull()
    ).select(F.col("url").alias("doc_id"), F.col("body_text").alias("text"))
    docs = docs.groupBy("doc_id").agg(
        F.expr("min_by(text, md5(text))").alias("text")
    )
    want_index = bm25_index(docs)

    got = sorted(tuple(r) for r in snap.collect())
    want = sorted(tuple(r) for r in want_index.collect())
    assert got == want and len(got) > 0
    # the re-crawled url's postings are the batch-2 version
    recrawl_url = rows[first]["url"]
    assert sorted(
        tuple(r) for r in snap.where(F.col("doc_id") == recrawl_url).collect()
    ) == sorted(
        tuple(r)
        for r in want_index.where(F.col("doc_id") == recrawl_url).collect()
    )

    # serving parity from the two indexes
    term = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t")) \
        .where("t <> ''").groupBy("t").count() \
        .orderBy(F.desc("count"), "t").first()["t"]
    a = bm25_topk(docs, term, index=snap, top_n=5).collect()
    b = bm25_topk(docs, term, index=want_index, top_n=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0


def test_stream_components_equals_batch(spark, tmp_path):
    """Incremental label maintenance: after 3 pair micro-batches
    (including one that merges two earlier components), the label
    snapshot equals from-scratch CC over the union of all pairs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_poc_spark.operators.dedup import connected_components
    from ocr_poc_spark.streaming.stream_job import (
        components_snapshot, start_components_stream,
    )

    batches = [
        [("a", "b"), ("m", "n")],
        [("b", "c"), ("x", "y")],
        [("c", "m"), ("p", "q")],   # merges {a,b,c} with {m,n}
    ]
    in_dir = str(tmp_path / "pairs")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        path = f"{in_dir}/part-{i}.parquet"
        pq.write_table(
            pa.table({
                "id_a": pa.array([r[0] for r in rows], pa.string()),
                "id_b": pa.array([r[1] for r in rows], pa.string()),
            }),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    state = str(tmp_path / "state")
    q = start_components_stream(
        spark, in_dir, str(tmp_path / "ck"), state, max_files=1
    )
    q.awaitTermination(240)

    got = {
        (r["doc_id"], r["component_id"])
        for r in components_snapshot(spark, state).collect()
    }
    allp = [p for b in batches for p in b]
    want = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            spark.createDataFrame(allp, "id_a string, id_b string")
        ).collect()
    }
    assert got == want
    assert ("n", "a") in got          # cross-batch merge to global min
    assert ("q", "p") in got          # untouched component intact
