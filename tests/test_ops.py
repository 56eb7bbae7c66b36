"""Unit tests for dedup / similarity / textstats / multimodal operators."""

import pyspark.sql.functions as F

from ocr_poc_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from ocr_poc_spark.operators.multimodal import (
    decode_media,
    make_fake_payload,
    sample_frames,
)
from ocr_poc_spark.operators.similarity import cosine_topk, lsh_ann_topk
from ocr_poc_spark.operators.textstats import fingerprint, lang_id, token_stats


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (2, "the quick brown fox jumps over the lazy dog", "en", "s0"),  # exact dup
        (3, "the quick brown fox leaps over the lazy dog", "en", "s0"),  # near dup
        (4, "completely different text about spark pipelines here", "en", "s0"),
        (5, "le renard brun saute par dessus le chien paresseux", "fr", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_exact_duplicates(spark):
    out = exact_duplicates(_docs(spark)).collect()
    assert len(out) == 1 and out[0]["keeper_id"] == 1 and out[0]["n_copies"] == 2


def test_ngram_jaccard_pairs(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), group_col="source", threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0           # identical
    assert 0.5 <= out[(1, 3)] < 1.0     # one word differs
    assert (1, 4) not in out


def test_minhash_lsh_finds_near_dups(spark):
    out = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()}
    assert (1, 2) in out
    assert (1, 4) not in out


def test_simhash_near_pairs(spark):
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(_docs(spark), max_hamming=10).collect()}
    assert out[(1, 2)] == 0             # identical text -> same simhash
    assert (1, 3) in out                # near dup within hamming 10
    assert (1, 4) not in out


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, query_ids=[0], k=3).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] > 0.99


def test_cosine_topk_broadcast_guard(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="query_ids"):
        cosine_topk(df, k=1)
    with pytest.raises(ValueError, match="refusing to broadcast"):
        cosine_topk(df, query_ids=list(range(10)), k=1, max_broadcast_queries=5)


def test_lsh_ann_agrees_with_bruteforce_mostly(spark, fixture_rows):
    import numpy as np

    rs = np.random.RandomState(3)
    rows = [(i, rs.randn(16).astype(float).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, query_ids=list(range(80)), k=1).collect()
    }
    approx = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in lsh_ann_topk(df, k=1, dim=16, n_planes=4).collect()
    }
    hits = sum(1 for k, v in approx.items() if exact.get(k) == v)
    assert hits >= 0.5 * len(exact)  # approximate, but far above chance


def test_token_stats_and_fingerprint(spark):
    d = _docs(spark)
    ts = {r["doc_id"]: r for r in token_stats(d).collect()}
    assert ts[1]["n_tokens"] == 9
    assert ts[1]["n_chars_calc"] == len("the quick brown fox jumps over the lazy dog")
    fp = {r["doc_id"]: r for r in fingerprint(d).collect()}
    assert fp[1]["md5_fp"] == fp[2]["md5_fp"]
    assert fp[1]["md5_fp"] != fp[4]["md5_fp"]
    assert fp[1]["winnow_fp"] == fp[2]["winnow_fp"]


def test_lang_id(spark):
    d = _docs(spark)
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(d).collect()}
    assert out[1] == "en" and out[5] == "fr"


def test_multimodal_decode_and_frames(spark):
    rows = [
        (1, "image", make_fake_payload("I", 640, 480, 1, b"\x10" * 32)),
        (2, "video", make_fake_payload("V", 320, 240, 6, bytes(range(96)))),
        (3, "image", b"\x89PNG not a fake payload"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert dec[1]["status"] == "ok" and dec[1]["width"] == 640
    assert dec[2]["n_frames"] == 6
    assert dec[3]["status"] == "unsupported"  # graceful, not a crash
    frames = sample_frames(media, every_n=2, frame_bytes=16).collect()
    assert [f["frame_no"] for f in frames if f["media_id"] == 2] == [0, 2, 4]
    assert all(len(f["frame"]) == 16 for f in frames)


def test_host_stats_salted_equals_direct(spark, pages_df):
    import pyspark.sql.functions as F

    from ocr_poc_spark.operators.hoststats import host_of, host_stats

    salted = {r["host"]: (r["n_pages"], r["total_bytes"]) for r in host_stats(pages_df).collect()}
    direct = {
        r["host"]: (r["n"], r["b"])
        for r in pages_df.select(host_of("url").alias("host"), F.length("html").cast("long").alias("nb"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nb").alias("b"))
        .collect()
    }
    assert salted == direct
    # fixture hosts are genuinely skewed: top host owns > 15% of pages
    total = sum(n for n, _ in direct.values())
    assert max(n for n, _ in direct.values()) > 0.15 * total


def test_time_banded_join_equals_plain_join_on_hot_key(spark):
    """Skew fixture: user 0 owns ~10% of all events. The bucketed band
    join must return EXACTLY the rows of the plain key join + band
    filter, while keying the shuffle on (user, hour-bucket)."""
    from ocr_poc_spark.operators.bandjoin import time_banded_join

    BAND = 3600_000_000
    rows_l, rows_r = [], []
    for i in range(400):
        user = 0 if i % 10 == 0 else i % 37          # hot user 0
        ts = (i * 977_000_003) % (50 * BAND)         # spread over 50 hours
        rows_l.append((i, user, ts))
        rows_r.append((10_000 + i, user, (ts + (i % 3) * BAND // 2) % (50 * BAND), float(i)))
    left = spark.createDataFrame(rows_l, "click_id long, user_id long, c_us long")
    right = spark.createDataFrame(rows_r, "purchase_id long, user_id long, p_us long, p_value double")

    banded = time_banded_join(left, right, "user_id", "c_us", "p_us", BAND)
    plain = left.join(right, "user_id").where(
        (F.col("p_us") > F.col("c_us")) & (F.col("p_us") <= F.col("c_us") + BAND)
    )
    cols = ["click_id", "purchase_id"]
    b = sorted(tuple(r) for r in banded.select(cols).collect())
    p = sorted(tuple(r) for r in plain.select(cols).collect())
    assert b == p and len(b) > 0


def test_simhash_banding_recall_is_exact(spark):
    """The pigeonhole banding claims recall 1.0 at ANY max_hamming: the
    banded pair set must equal the exact all-pairs hamming filter on a
    randomized corpus of near-duplicate variants."""
    import itertools
    import random

    from ocr_poc_spark.operators.dedup import simhash, simhash_near_pairs

    rnd = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs, did = [], 0
    for _ in range(12):
        base = rnd.choices(vocab, k=30)
        for _ in range(3):  # 3 variants per base, 0-2 word edits each
            v = list(base)
            for _ in range(rnd.randrange(0, 3)):
                v[rnd.randrange(len(v))] = rnd.choice(vocab)
            docs.append((did, " ".join(v)))
            did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = sorted(simhash(df).collect(), key=lambda r: r["id"])
    for h in (3, 7):
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_pairs(df, max_hamming=h).collect()
        }
        exact = {
            (a["id"], b["id"], bin(a["simhash"] ^ b["simhash"]).count("1"))
            for a, b in itertools.combinations(fps, 2)
            if bin(a["simhash"] ^ b["simhash"]).count("1") <= h
        }
        assert banded == exact and len(exact) > 0, (h, len(banded), len(exact))


def test_ngram_jaccard_refuses_oversized_groups(spark):
    """The all-pairs variant must refuse quadratic blowups explicitly."""
    import pytest

    df = spark.createDataFrame(
        [(i, "same words here", "en", "s0") for i in range(30)],
        "doc_id long, text string, lang string, source string",
    )
    with pytest.raises(Exception, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(df, group_col="lang", max_group_rows=10).count()
    # waivable, and the small default passes untouched
    assert ngram_jaccard_pairs(df, group_col="lang", max_group_rows=None).count() > 0


def test_scrub_pii_and_repetition_stats(spark):
    from ocr_poc_spark.operators.textstats import repetition_stats, scrub_pii

    d = spark.createDataFrame(
        [
            (1, "reach me at a.b+c@corp.example.org or 192.168.1.20 tel +44 20 7946 0958 ok"),
            (2, "no pii here just words words words words words words"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r for r in scrub_pii(d).collect()}
    assert (s[1]["n_emails"], s[1]["n_ipv4"], s[1]["n_phones"]) == (1, 1, 1)
    assert "<EMAIL>" in s[1]["scrubbed"] and "<IP>" in s[1]["scrubbed"]
    assert "<PHONE>" in s[1]["scrubbed"] and "@" not in s[1]["scrubbed"]
    assert s[2]["scrubbed"] == "no pii here just words words words words words words"

    r = {x["doc_id"]: x for x in repetition_stats(d).collect()}
    # doc 2: 'words'x6 run -> trigram 'words words words' repeats 3 times
    assert r[2]["dup_trigram_ratio"] > 0.3
    assert r[1]["dup_trigram_ratio"] == 0.0
    assert r[2]["alpha_word_ratio"] == 1.0
    assert r[3]["n_words"] == 1 and r[3]["max_word_len"] == 0  # split('')=['']


def test_multimodal_robust_to_garbage_payloads(spark):
    """Null / truncated / header-only payloads degrade to
    status='unsupported' (decode) or are skipped (frames) — never a
    failed task."""
    rows = [
        (1, "image", None),
        (2, "image", b"FAKE"),          # truncated after magic
        (3, "video", b"FAKEV"),         # truncated header
        (4, "video", make_fake_payload("V", 10, 10, 4, bytes(range(64)))),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    dec = {r["media_id"]: r["status"] for r in decode_media(media).collect()}
    assert dec == {1: "unsupported", 2: "unsupported", 3: "unsupported", 4: "ok"}
    frames = sample_frames(media, every_n=2, frame_bytes=16).collect()
    assert {f["media_id"] for f in frames} == {4}


def test_lsh_bucket_dim_mismatch_raises(spark):
    """A wrong dim must raise loudly, not silently return zero rows."""
    import pytest

    df = spark.createDataFrame(
        [(0, [1.0] * 16), (1, [0.9] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="lsh_bucket: dim=64"):
        lsh_ann_topk(df, k=1, dim=64, n_planes=4).collect()


def test_embedding_near_dup_lsh_recall_bound(spark):
    """Property bounds for the LSH-bucketed embedding near-dup SCALE path
    (similarity.embedding_near_dup_pairs) in the approximate regime the
    driver query can't cover (its planted x2-copy pairs have provable
    recall 1.0):

    - precision is EXACT: every emitted pair must also satisfy the
      cosine threshold under the exact all-pairs variant (the operator
      re-scores candidates exactly, so this must be equality-of-subset);
    - recall vs the exact variant >= 0.9 on a corpus of genuinely
      near-but-not-identical pairs (cosine ~0.98, i.e. the regime
      hyperplane LSH is built for; seeded, deterministic).
    """
    import numpy as np

    from ocr_poc_spark.operators.similarity import (
        cosine_near_dup_pairs_exact,
        embedding_near_dup_pairs,
    )

    rs = np.random.RandomState(11)
    base = rs.randn(120, 32)
    noisy = base + 0.10 * rs.randn(120, 32)  # cosine vs base ~0.97-0.99
    rows = [(i, base[i].astype(float).tolist()) for i in range(120)] + [
        (1000 + i, noisy[i].astype(float).tolist()) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs_exact(df, cosine_threshold=0.95).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, cosine_threshold=0.95, dim=32, n_planes=8, n_tables=8
        ).collect()
    }
    assert len(exact) >= 80  # the fixture really contains near-dup pairs
    assert lsh <= exact  # precision 1.0: no emitted pair below threshold
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(lsh)}/{len(exact)})"


def test_connected_components_transitive_chain(spark):
    """A~B, B~C without A~C must land in ONE component keyed by the min
    id; disjoint pairs stay separate; isolated structure preserved."""
    from ocr_poc_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_connected_components_long_chain_converges_in_log_rounds(spark):
    """A 64-node path graph (worst diameter per edge) must converge
    within the default max_iter=12 (large-star/small-star halves chain
    depth per round) and produce a single component."""
    from ocr_poc_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 64
    assert {r.component_id for r in rows} == {0}


def test_connected_components_empty_and_self_pairs(spark):
    """Empty input -> empty output; self-pairs are dropped, not looped."""
    from ocr_poc_spark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    selfp = spark.createDataFrame([(5, 5), (5, 6)], "id_a long, id_b long")
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(selfp).collect()
    }
    assert got == {(5, 5), (6, 5)}


def test_connected_components_string_ids(spark):
    """The CLI curation frame keys documents on url STRINGS — the
    operator must work on any orderable id type, component_id = the
    lexicographic minimum."""
    from ocr_poc_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("b.com/1", "c.com/2"), ("c.com/2", "a.com/9")],
        "id_a string, id_b string",
    )
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        ("a.com/9", "a.com/9"),
        ("b.com/1", "a.com/9"),
        ("c.com/2", "a.com/9"),
    }


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF with n_probe=4 of 8 centroids must recover the exact top-1
    neighbor for most queries (far above chance) and every returned
    cosine must be exact (the re-rank is exact by construction: verify
    against brute force where the pair overlaps)."""
    import numpy as np

    from ocr_poc_spark.operators.similarity import cosine_topk, ivf_ann_topk

    rs = np.random.RandomState(11)
    rows = [(i, rs.randn(16).astype(float).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(df, query_ids=list(range(80)), k=1).collect()
    }
    approx = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_ann_topk(
            df, k=1, dim=16, n_centroids=8, n_probe=4, n_iter=3
        ).collect()
    }
    hits = sum(
        1 for key, (nid, _) in approx.items() if exact.get(key, (None,))[0] == nid
    )
    assert hits >= 0.5 * len(exact)
    for key, (nid, cos) in approx.items():
        if exact.get(key, (None,))[0] == nid:
            assert abs(exact[key][1] - cos) < 1e-12


def test_ivf_kmeans_is_deterministic_across_partitionings(spark):
    """Centroids (and therefore assignments/results) must be byte-stable
    whether the input arrives in 1 or 7 partitions — the 4-decimal
    rounding absorbs double-summation order differences."""
    import numpy as np

    from ocr_poc_spark.operators.similarity import kmeans_centroids

    rs = np.random.RandomState(5)
    rows = [(i, rs.randn(8).astype(float).tolist()) for i in range(60)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(1)
    df7 = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(7)
    c1 = kmeans_centroids(df1, dim=8, n_centroids=4, n_iter=3, seed=2)
    c7 = kmeans_centroids(df7, dim=8, n_centroids=4, n_iter=3, seed=2)
    assert c1 == c7


def test_minhash_incremental_equals_batch_restriction(spark):
    """minhash_lsh_pairs_incremental(new, corpus) must EXACTLY equal
    minhash_lsh_pairs(new UNION corpus) restricted to pairs touching a
    new id — including new-vs-new pairs and identical jaccard values —
    whether the index is passed in precomputed or derived internally."""
    import numpy as np

    from ocr_poc_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    rs = np.random.RandomState(9)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        toks = [words[j] for j in rs.randint(0, 40, size=25)]
        rows.append((i, " ".join(toks)))
        if i % 5 == 4:  # plant a near-dup of the previous doc
            mut = list(toks)
            mut[3] = words[rs.randint(0, 40)]
            rows.append((i + 1000, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.where("doc_id % 3 = 0")
    corpus = df.where("doc_id % 3 != 0")

    batch = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
        if r.id_a % 3 == 0 or r.id_b % 3 == 0
    }
    assert batch, "fixture produced no near-dup pairs touching new docs"
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs_incremental(
            new, corpus, jaccard_threshold=0.5
        ).collect()
    }
    assert inc == batch
    idx = minhash_band_index(corpus)
    inc2 = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs_incremental(
            new, corpus, corpus_index=idx, jaccard_threshold=0.5
        ).collect()
    }
    assert inc2 == batch


def test_connected_components_star_graphs_both_orientations(spark):
    """Degree skew: a 400-edge star must resolve in one component
    whether the hub is the component MINIMUM (already canonical) or the
    MAXIMUM (every spoke must re-point away from the hub)."""
    from ocr_poc_spark.operators.dedup import connected_components

    hub_min = spark.createDataFrame(
        [(0, i) for i in range(1, 401)], "id_a long, id_b long"
    )
    got = connected_components(hub_min).collect()
    assert len(got) == 401 and {r.component_id for r in got} == {0}

    hub_max = spark.createDataFrame(
        [(10_000, i) for i in range(1, 401)], "id_a long, id_b long"
    )
    got = connected_components(hub_max).collect()
    assert len(got) == 401 and {r.component_id for r in got} == {1}


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Seeded random-graph sweep vs a pure-Python union-find reference:
    the distributed large-star/small-star fixpoint must produce exactly
    the min-id component labelling on arbitrary topologies (cycles,
    multi-edges, self-loops, isolated chains)."""
    import numpy as np

    from ocr_poc_spark.operators.dedup import connected_components

    for seed in (1, 2, 3, 4, 5):
        rs = np.random.RandomState(seed)
        n_edges = int(rs.randint(5, 60))
        edges = [
            (int(rs.randint(0, 40)), int(rs.randint(0, 40)))
            for _ in range(n_edges)
        ]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = set()
        for a, b in edges:
            if a != b:
                nodes.update((a, b))
                parent[find(a)] = find(b)
        comp_min: dict[int, int] = {}
        for x in nodes:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        expected = {(x, comp_min[find(x)]) for x in nodes}

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            (r.doc_id, r.component_id)
            for r in connected_components(df).collect()
        }
        assert got == expected, f"seed={seed}"


def test_ivf_broadcast_and_literal_paths_agree(spark):
    """The broadcast centroid encoding (the default at every k since
    round 4) must produce EXACTLY the literal encoding's output — same
    distance folds, same (d, i) argmin tie-break, same probes."""
    import numpy as np

    import ocr_poc_spark.operators.similarity as sim

    rs = np.random.RandomState(21)
    rows = [(i, rs.randn(16).astype(float).tolist()) for i in range(70)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lit = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in sim.ivf_ann_topk(
            df, k=2, dim=16, n_centroids=8, n_probe=3, n_iter=2,
            centroid_encoding="literal",
        ).collect()
    }
    bc = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in sim.ivf_ann_topk(
            df, k=2, dim=16, n_centroids=8, n_probe=3, n_iter=2
        ).collect()
    }
    assert bc == lit


def test_hash_embedding_shape_and_contracts(spark):
    """Fixed-dim integer vectors; each token moves exactly one cell by
    +-1 (sum of |cells| <= n_tokens, equality when no sign collisions);
    empty/null text yields the zero vector; non-power-of-two dim is
    refused; output is partitioning-independent."""
    import pytest

    from ocr_poc_spark.operators.textstats import hash_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.embedding for r in hash_embedding(df, dim=8).collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert sum(abs(x) for x in rows[1]) <= 4
    assert sum(abs(x) for x in rows[1]) > 0
    assert rows[2] == [0] * 8 and rows[3] == [0] * 8

    with pytest.raises(ValueError, match="power of two"):
        hash_embedding(df, dim=12)

    r7 = {
        r.doc_id: r.embedding
        for r in hash_embedding(df.repartition(7), dim=8).collect()
    }
    assert r7 == rows


def test_ivf_serving_mode_separate_queries_and_fixed_centroids(spark):
    """Serving mode: only the supplied query frame is answered, every
    neighbor comes from the corpus frame, and passing centroids skips
    k-means (deterministic output for fixed centroids)."""
    import numpy as np

    from ocr_poc_spark.operators.similarity import ivf_ann_topk

    rs = np.random.RandomState(31)
    corpus = spark.createDataFrame(
        [(i, rs.randn(8).astype(float).tolist()) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(1000 + i, rs.randn(8).astype(float).tolist()) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    cents = rs.randn(6, 8).astype(float).tolist()
    out = ivf_ann_topk(
        corpus, k=2, dim=8, n_probe=3, queries=queries, centroids=cents
    ).collect()
    assert out, "no results"
    assert {r.query_id for r in out} <= {1000 + i for i in range(10)}
    assert {r.neighbor_id for r in out} <= set(range(60))
    out2 = ivf_ann_topk(
        corpus, k=2, dim=8, n_probe=3, queries=queries, centroids=cents
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ivf_serving_broadcast_branch_agrees_with_literal(spark):
    """The serving-mode BROADCAST branch (the path production serving
    would take with k ~ sqrt(n)) must equal the literal path for the
    same centroids — in particular the probe prefix must come from the
    QUERY frame, not the corpus frame."""
    import numpy as np

    import ocr_poc_spark.operators.similarity as sim

    rs = np.random.RandomState(41)
    corpus = spark.createDataFrame(
        [(i, rs.randn(8).astype(float).tolist()) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(900 + i, rs.randn(8).astype(float).tolist()) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    cents = rs.randn(6, 8).astype(float).tolist()
    lit = sorted(
        map(tuple, sim.ivf_ann_topk(
            corpus, k=2, dim=8, n_probe=3, queries=queries, centroids=cents,
            centroid_encoding="literal",
        ).collect())
    )
    bc = sorted(
        map(tuple, sim.ivf_ann_topk(
            corpus, k=2, dim=8, n_probe=3, queries=queries, centroids=cents
        ).collect())
    )
    assert bc == lit


def test_ivf_rejects_mismatched_centroid_and_vector_dims(spark):
    """Dim drift in a persisted quantizer or the input vectors must FAIL
    LOUDLY, never silently collapse recall (zip_with null-pads on
    mismatch, turning every distance into NULL)."""
    import numpy as np
    import pytest

    from ocr_poc_spark.operators.similarity import ivf_ann_topk

    rs = np.random.RandomState(43)
    df = spark.createDataFrame(
        [(i, rs.randn(8).astype(float).tolist()) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="dims, expected dim"):
        ivf_ann_topk(df, dim=8, centroids=rs.randn(4, 4).tolist())
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        ivf_ann_topk(df, dim=16, n_centroids=4, n_iter=1).collect()


def test_cosine_ops_survive_zero_vectors(spark):
    """An all-zero vector (empty doc through hash_embedding) must never
    crash a cosine consumer (ANSI DIVIDE_BY_ZERO) nor appear in any
    pair/top-k output — it has no defined direction."""
    from ocr_poc_spark.operators.similarity import (
        cosine_near_dup_pairs_exact,
        cosine_topk,
        ivf_ann_topk,
        lsh_ann_topk,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 0.0, 1.0]),
            (1, [1.0, 2.0, 0.1, 1.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = cosine_near_dup_pairs_exact(df, cosine_threshold=0.5).collect()
    assert pairs and all(2 not in (r.id_a, r.id_b) for r in pairs)
    topk = cosine_topk(df, query_ids=[0, 1, 2], k=2).collect()
    assert topk and all(r.query_id != 2 and r.neighbor_id != 2 for r in topk)
    ann = lsh_ann_topk(df, k=2, dim=4, n_planes=2, n_tables=2).collect()
    assert all(r.query_id != 2 and r.neighbor_id != 2 for r in ann)
    ivf = ivf_ann_topk(df, k=2, dim=4, n_centroids=2, n_probe=2, n_iter=1).collect()
    assert all(r.query_id != 2 and r.neighbor_id != 2 for r in ivf)


def test_connected_components_partitioning_independent(spark):
    """Same labelling whether edges arrive in 1 or 7 partitions (the
    fixpoint is a pure function of the edge SET; localCheckpoints must
    not leak partition-layout artifacts into results)."""
    import numpy as np

    from ocr_poc_spark.operators.dedup import connected_components

    rs = np.random.RandomState(17)
    edges = [
        (int(rs.randint(0, 30)), int(rs.randint(0, 30))) for _ in range(40)
    ]
    df1 = spark.createDataFrame(edges, "id_a long, id_b long").coalesce(1)
    df7 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    r1 = sorted(map(tuple, connected_components(df1).collect()))
    r7 = sorted(map(tuple, connected_components(df7).collect()))
    assert r1 == r7


def test_connected_components_hub_star_1e5(spark):
    """A single ~1e5-leaf star (the 10M-copy-boilerplate-cluster shape
    at test scale): the hub-degree-bounded star rounds must label every
    leaf with the hub min without materializing the hub's neighborhood
    as an array anywhere (plan side pinned separately in
    test_plan_shapes.py::test_star_round_is_hub_degree_bounded)."""
    from ocr_poc_spark.operators.dedup import connected_components

    n = 100_000
    # hub id sits mid-range so the component min is a LEAF id (0), not
    # the hub — exercises both star directions on the skewed node.
    hub = n // 2
    pairs = spark.range(n).selectExpr(
        f"CASE WHEN id = {hub} THEN id + 1 ELSE id END AS id_a",
        f"{hub}L AS id_b",
    )
    got = connected_components(pairs)
    agg = got.groupBy("component_id").count().collect()
    assert len(agg) == 1
    assert agg[0]["component_id"] == 0
    assert agg[0]["count"] == n


def test_incremental_dedup_rejects_mismatched_index(spark):
    """A persisted band index built with a different banding config must
    fail LOUDLY, not silently lose recall (band sigs never colliding)."""
    import pytest

    from ocr_poc_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_pairs_incremental,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    # schema drift: missing band column
    bad = minhash_band_index(corpus).select("id", "sig")
    with pytest.raises(ValueError, match="missing columns"):
        minhash_lsh_pairs_incremental(new, corpus, corpus_index=bad)
    # config drift: index built with MORE bands than the query side
    wide = minhash_band_index(corpus, num_hashes=32, num_bands=16)
    with pytest.raises(Exception, match="band out of range"):
        minhash_lsh_pairs_incremental(
            new, corpus, corpus_index=wide, num_hashes=8, num_bands=4
        ).collect()
    # matching config still works end-to-end
    ok = minhash_band_index(corpus)
    pairs = minhash_lsh_pairs_incremental(
        new, corpus, corpus_index=ok
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 100)]


def test_abs_banded_join_equals_plain_join_on_hot_key(spark):
    """Two-sided band join parity: exactly the rows of the plain key
    join + |dt| <= band filter, on a 10%-hot-user fixture, including
    pairs in the left-of, same, and right-of buckets."""
    from ocr_poc_spark.operators.bandjoin import abs_banded_join

    BAND = 300_000_000
    rows_l, rows_r = [], []
    for i in range(400):
        user = 0 if i % 10 == 0 else i % 37
        ts = (i * 977_000_003) % (50 * BAND)
        rows_l.append((i, user, ts))
        rows_r.append(
            (10_000 + i, user, (ts + (i % 5 - 2) * BAND // 2) % (50 * BAND), float(i))
        )
    left = spark.createDataFrame(rows_l, "err_id long, user_id long, e_us long")
    right = spark.createDataFrame(
        rows_r, "view_id long, user_id long, v_us long, v_value double"
    )
    banded = abs_banded_join(left, right, "user_id", "e_us", "v_us", BAND)
    plain = left.join(right, "user_id").where(
        F.abs(F.col("v_us") - F.col("e_us")) <= BAND
    )
    cols = ["err_id", "view_id"]
    b = sorted(tuple(r) for r in banded.select(cols).collect())
    p = sorted(tuple(r) for r in plain.select(cols).collect())
    assert b == p and len(b) > 0
    # duplicates would double-count boosts downstream
    assert len(b) == len(set(b))


def test_bigram_lm_scores_contract(spark):
    """CCNet-style perplexity filter: a gibberish doc scores worse than
    fluent text under a model trained on a SEPARATE fluent corpus;
    short/empty docs yield no row; integer witness columns are exact."""
    import math

    import pytest as _pytest

    from ocr_poc_spark.operators.textstats import bigram_lm_scores

    train = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "the cat sat on the sofa"),
            (2, "zqx vbn qwe rty uio"),
            (3, "a"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(score, train_df=train).collect()}
    assert set(rows) == {1, 2}  # 3 and 4 have no bigrams
    assert rows[1]["cross_entropy"] < rows[2]["cross_entropy"]
    assert rows[1]["ppl"] < rows[2]["ppl"]
    assert rows[1]["n_bigrams"] == 5 and rows[2]["n_bigrams"] == 4
    assert rows[1]["n_seen"] == 4  # "the sofa" unseen as a bigram
    assert rows[2]["n_seen"] == 0
    # mirror doc 1 exactly: counts from the train corpus
    big = {("the", "cat"): 5, ("cat", "sat"): 5, ("sat", "on"): 10,
           ("on", "the"): 10, ("the", "sofa"): 0}
    pre = {"the": 20, "cat": 5, "sat": 10, "on": 10, "sofa": 0}
    V = 8  # the cat sat on mat and dog rug
    bs = [("the", "cat"), ("cat", "sat"), ("sat", "on"), ("on", "the"),
          ("the", "sofa")]
    h = sum(
        -math.log2((big[p] + 0.5) / (pre[p[0]] + 0.5 * (V + 1))) for p in bs
    )
    assert rows[1]["cross_entropy"] == round(h / 5, 4)

    with _pytest.raises(ValueError, match="alpha"):
        bigram_lm_scores(score, alpha=0.0)


def test_bm25_topk_contract(spark):
    """BM25 semantics on a hand-checkable corpus: rarer query terms
    dominate (idf), length normalization penalizes padded docs, docs
    matching no term never appear, blank query raises."""
    import math

    import pytest

    from ocr_poc_spark.operators.search import bm25_topk

    docs = [
        (1, "spark shuffle spark shuffle spark"),   # tf-heavy on common term
        (2, "quantile sketch here"),                # hits the RARE term once
        (3, "spark " + "filler " * 60),             # padded: length-normalized down
        (4, "nothing relevant at all"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bm25_topk(d, "spark quantile", top_n=10).collect()}
    assert 4 not in out
    assert set(out) == {1, 2, 3}
    # idf(quantile): df=1 beats idf(spark): df=2 at N=4 -> doc 2 wins
    assert out[2]["score"] > out[1]["score"] > out[3]["score"]
    assert out[1]["n_hit_terms"] == 1 and out[2]["n_hit_terms"] == 1

    # exact mirror for doc 2
    N, avg = 4.0, sum(len(t.split()) for _, t in docs) / 4.0
    idf = math.log((N - 1 + 0.5) / (1 + 0.5) + 1.0)
    tfp = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 3 / avg))
    assert out[2]["score"] == round(idf * tfp, 4)

    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(d, "   ")


def test_bm25_serving_mode_equals_direct(spark):
    """Index-once/query-many: scoring against the persisted bm25_index
    must equal the direct corpus path row-for-row, for several
    queries, without touching document text."""
    from ocr_poc_spark.operators.search import bm25_index, bm25_topk

    d = spark.createDataFrame(
        [
            (i, f"spark shuffle join w{i} " * (i % 3 + 1) + "table scan")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    idx = bm25_index(d)
    assert set(idx.columns) == {"term", "doc_id", "tf", "dl"}
    for q in ("spark table", "join w7", "scan shuffle spark"):
        direct = sorted(map(tuple, bm25_topk(d, q, top_n=10).collect()))
        served = sorted(
            map(tuple, bm25_topk(d, q, top_n=10, index=idx).collect())
        )
        assert direct == served and direct


def test_dsir_importance_weights_rank_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outweigh off-domain
    docs; weights are deterministic; empty docs yield no row; the
    top-n cut is (logw desc, id) stable."""
    import pytest

    from ocr_poc_spark.operators.dsir import dsir_select, importance_weights

    raw = spark.createDataFrame(
        [
            (1, "the spark shuffle join optimizer plans the join"),
            (2, "spark plans shuffle joins with the optimizer"),
            (3, "cheap viagra casino bonus click here casino"),
            (4, "casino bonus click viagra cheap cheap"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "the spark optimizer plans every shuffle join")],
        "doc_id long, text string",
    )
    w = importance_weights(raw, target)
    rows = {r["doc_id"]: r for r in w.collect()}
    assert set(rows) == {1, 2, 3, 4}  # empty/NULL docs yield no row
    assert rows[1]["logw"] > rows[3]["logw"]
    assert rows[2]["logw"] > rows[4]["logw"]
    # n_ngrams = unigrams + bigrams = 2*len - 1 for these docs
    assert rows[1]["n_ngrams"] == 15 and rows[3]["n_ngrams"] == 13

    again = {r["doc_id"]: r["logw"] for r in importance_weights(raw, target).collect()}
    assert again == {k: r["logw"] for k, r in rows.items()}

    top = dsir_select(raw, target, top_n=2)
    assert [r["doc_id"] for r in top.collect()] == sorted(
        [1, 2], key=lambda i: (-rows[i]["logw"], i)
    )

    with pytest.raises(ValueError, match="alpha"):
        importance_weights(raw, target, alpha=0.0)
    with pytest.raises(ValueError, match="n_buckets"):
        importance_weights(raw, target, n_buckets=0)


def test_semantic_dedup_within_cluster_groups(spark):
    """Near-dup groups resolve within clusters with one keeper (min
    id); transitive chains collapse; pairs straddling a centroid
    boundary are NOT emitted (the SemDeDup approximation, by
    contract); dup-free docs yield no row; dim mismatch raises."""
    import pytest

    from ocr_poc_spark.operators.similarity import assign_clusters, semantic_dedup

    centroids = [[10.0, 0.0], [0.0, 10.0]]
    rows = [
        (1, [9.0, 0.0]),     # cluster 0
        (2, [9.0, 0.1]),     # ~dup of 1
        (3, [8.9, 0.2]),     # ~dup of 2 (chain 1-2-3)
        (4, [0.0, 9.0]),     # cluster 1
        (5, [0.1, 9.0]),     # ~dup of 4
        (6, [5.1, 5.0]),     # straddles the boundary -> cluster 0
        (7, [5.0, 5.1]),     # near-identical to 6 but cluster 1
        (8, [-9.0, 0.5]),    # no dup anywhere
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    asg = {r["vec_id"]: r["cluster"] for r in assign_clusters(d, centroids).collect()}
    assert asg[6] == 0 and asg[7] == 1 and asg[1] == 0 and asg[4] == 1

    out = {r["vec_id"]: r for r in semantic_dedup(d, centroids, cosine_threshold=0.999).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # 6/7 split by the boundary; 8 dup-free
    assert {k: v["component_id"] for k, v in out.items()} == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    assert [k for k, v in out.items() if v["keeper"]] == [1, 4] or \
        sorted(k for k, v in out.items() if v["keeper"]) == [1, 4]

    with pytest.raises(ValueError, match="centroids is empty"):
        semantic_dedup(d, [], cosine_threshold=0.9)
    with pytest.raises(Exception, match="dim"):
        semantic_dedup(d, [[1.0, 2.0, 3.0]], cosine_threshold=0.9).collect()


def test_corpus_quantiles_exact_and_approx(spark):
    """Exact path reproduces hand-computed linear interpolation; approx
    (t-digest scale path) lands within rank-error bounds of exact;
    invalid ps raise."""
    import pytest

    from ocr_poc_spark.operators.textstats import corpus_quantiles

    vals = list(range(1, 101))  # 1..100 in one group
    d = spark.createDataFrame([("g", v) for v in vals], "lang string, x long")
    ex = corpus_quantiles(d, "x", keys=["lang"], ps=(0.25, 0.5, 0.99), exact=True)
    r = ex.collect()[0]
    assert set(ex.columns) == {"lang", "n", "mean", "p25", "p50", "p99"}
    assert r["n"] == 100 and r["mean"] == 50.5
    # exact percentile: rank p*(n-1) on the sorted values
    assert r["p25"] == 1 + 0.25 * 99 and r["p50"] == 1 + 0.5 * 99
    assert r["p99"] == 1 + 0.99 * 99

    ap = corpus_quantiles(d, "x", keys=["lang"], ps=(0.25, 0.5, 0.99)).collect()[0]
    for c in ("p25", "p50", "p99"):
        assert abs(ap[c] - r[c]) <= 2.0  # 100 values, accuracy 10000

    assert corpus_quantiles(d, "x", ps=(0.999,), exact=True).columns[-1] == "p99_9"

    with pytest.raises(ValueError, match="ps is empty"):
        corpus_quantiles(d, "x", ps=())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        corpus_quantiles(d, "x", ps=(1.5,))


def test_dsir_empty_target_raises_in_plan(spark):
    """An empty target corpus must fail loudly, never emit all-NULL
    weights (a silent select-nothing)."""
    import pytest

    from ocr_poc_spark.operators.dsir import importance_weights

    raw = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(Exception, match="target corpus has no n-grams"):
        importance_weights(raw, empty).collect()


def test_asof_join_backward_semantics(spark):
    """Backward-inclusive as-of: latest right row with ts <= left ts per
    key; same-instant rows match; (key, ts) ties resolved by tie_col;
    NULL-ts right rows never carried; NULL-ts left rows kept with a
    NULL match; output is exactly |L| rows."""
    from ocr_poc_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 5, "l5"), (1, 2, "l2"), (2, 7, "l7"),
         (3, 4, "l4"), (1, None, "lnull")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 9, 100, "a"), (1, 2, 101, "b"), (1, 2, 102, "b2"),
         (2, 8, 103, "c"), (2, None, 104, "never"),],
        "k long, ts long, rid long, v string",
    )
    out = asof_join(left, right, on="k", tie_col="rid")
    rows = {(r["k"], r["ts"]): (r["ts_asof"], r["rid_asof"], r["v_asof"])
            for r in out.collect()}
    assert len(rows) == 6 and out.count() == 6
    assert rows[(1, 10)] == (9, 100, "a")
    assert rows[(1, 5)] == (2, 102, "b2")   # tie at ts=2 -> max rid wins
    assert rows[(1, 2)] == (2, 102, "b2")   # same-instant inclusive
    assert rows[(2, 7)] == (None, None, None)  # only later/NULL right rows
    assert rows[(3, 4)] == (None, None, None)  # key absent on right
    assert rows[(1, None)] == (None, None, None)

    # column subset + all left columns preserved
    assert set(out.columns) == {"k", "ts", "tag", "ts_asof", "rid_asof", "v_asof"}


def test_asof_join_forward_and_tolerance(spark):
    """Forward direction picks the earliest right row at-or-after the
    left ts (inclusive); tolerance nulls matches farther than the
    bound instead of falling back to the next nearest; backward
    results unchanged by a generous tolerance."""
    import pytest

    from ocr_poc_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 5), (1, 2), (2, 7)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 9, "a"), (1, 2, "b"), (2, 1, "c")], "k long, ts long, v string"
    )

    fwd = {(r["k"], r["ts"]): (r["ts_asof"], r["v_asof"])
           for r in asof_join(left, right, on="k", direction="forward").collect()}
    assert fwd == {
        (1, 10): (None, None),   # nothing at/after 10
        (1, 5): (9, "a"),
        (1, 2): (2, "b"),        # same-instant inclusive
        (2, 7): (None, None),    # only earlier right rows
    }

    tol = {(r["k"], r["ts"]): (r["ts_asof"], r["v_asof"])
           for r in asof_join(left, right, on="k", tolerance=2).collect()}
    assert tol == {
        (1, 10): (9, "a"),       # |10-9| <= 2
        (1, 5): (None, None),    # |5-2| = 3 > 2: nulled, NOT next-nearest
        (1, 2): (2, "b"),
        (2, 7): (None, None),    # |7-1| = 6 > 2
    }

    loose = {(r["k"], r["ts"]): r["v_asof"]
             for r in asof_join(left, right, on="k", tolerance=100).collect()}
    assert loose == {(1, 10): "a", (1, 5): "b", (1, 2): "b", (2, 7): "c"}

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="nearest")
    with pytest.raises(ValueError, match="non-negative"):
        asof_join(left, right, on="k", tolerance=-1)


def test_asof_join_tie_col_outside_right_cols(spark):
    """tie_col may be excluded from the output columns and still drive
    the (key, ts) collapse."""
    from ocr_poc_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 2, 101, "old"), (1, 2, 102, "new")],
        "k long, ts long, rid long, v string",
    )
    out = asof_join(
        left, right, on="k", right_cols=["v"], tie_col="rid"
    ).collect()
    assert len(out) == 1
    assert out[0]["v_asof"] == "new" and "rid_asof" not in out[0].asDict()


def test_semantic_near_pairs_cluster_cap(spark):
    """The honesty guard: a cluster above max_cluster_size fails the
    job loudly instead of silently running |c|^2 cosines; under the
    cap the output is unchanged."""
    import pytest

    from ocr_poc_spark.operators.similarity import semantic_near_pairs

    d = spark.createDataFrame(
        [(i, [9.0, float(i % 3) / 10]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = [[10.0, 0.0], [-10.0, 0.0]]  # everything lands in cluster 0
    ok = semantic_near_pairs(d, cents, cosine_threshold=0.999,
                             max_cluster_size=50).collect()
    assert ok == sorted(
        semantic_near_pairs(d, cents, cosine_threshold=0.999).collect()
    ) or {tuple(r) for r in ok} == {
        tuple(r) for r in semantic_near_pairs(d, cents, cosine_threshold=0.999).collect()
    }

    with pytest.raises(Exception, match="exceeds max_cluster_size"):
        semantic_near_pairs(
            d, cents, cosine_threshold=0.999, max_cluster_size=10
        ).collect()


def test_asof_join_null_keys_never_match(spark):
    """NULL join keys must behave like an equi-join (match nothing),
    not like a window partition (match each other)."""
    from ocr_poc_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(None, 5), (1, 5)], "k long, ts long")
    right = spark.createDataFrame(
        [(None, 3, "ghost"), (1, 3, "real")], "k long, ts long, v string"
    )
    rows = {r["k"]: r["v_asof"] for r in asof_join(left, right, on="k").collect()}
    assert rows == {None: None, 1: "real"}


def test_gopher_rules_thresholds(spark):
    """Each published rule flips on its published boundary; empty/NULL
    docs fail the word gate without poisoning the job (ANSI /0)."""
    from ocr_poc_spark.operators.textstats import gopher_rules

    good = ("the quick brown words flow and that sentence reads well "
            "have some more prose with normal shape " * 5).strip()
    rows = [
        (1, good),                                     # passes everything
        (2, "word " * 10),                             # too few words
        (3, ("#" * 30 + " word ") * 60),               # symbol ratio blown
        (4, "\n".join("- item" for _ in range(10))),   # all bullet lines
        (5, "12345 67890 " * 60),                      # no alphabetic words
        (6, ""),                                       # empty
        (7, None),                                     # NULL
        (8, ("zz " * 60).strip()),                     # no stopwords
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(d, min_words=20).collect()}
    assert got[1]["gopher_keep"] is True
    assert got[2]["ok_words"] is False and got[2]["gopher_keep"] is False
    assert got[3]["ok_symbols"] is False
    assert got[4]["ok_bullets"] is False
    assert got[5]["ok_alpha"] is False
    for i in (6, 7):
        assert got[i]["ok_words"] is False and got[i]["gopher_keep"] is False
        assert got[i]["mean_word_len"] is None
    assert got[8]["ok_stopwords"] is False
    # boundary: exactly min_words words passes the gate
    b = spark.createDataFrame(
        [(9, "the and " + "word " * 18)], "doc_id long, text string"
    )
    assert gopher_rules(b, min_words=20).collect()[0]["ok_words"] is True


def test_clean_text_normalization_and_idempotence(spark):
    from ocr_poc_spark.operators.textstats import clean_text

    rows = [
        (1, "a\x00b\x07c"),                          # controls stripped
        (2, "x​y﻿z"),                      # zero-widths stripped
        (3, "“quoted” ‘q’ – — a b"),
        (4, "a  \t b\n   line \n\n\n\n end  "),      # whitespace shaping
        (5, None),
        (6, "already clean text"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_text(d).collect()}
    assert got[1]["clean"] == "abc" and got[1]["n_ctrl"] == 2
    assert got[2]["clean"] == "xyz" and got[2]["n_zw"] == 2
    assert got[3]["clean"] == "\"quoted\" 'q' - - a b"
    assert got[4]["clean"] == "a b\nline\n\nend"
    assert got[5]["clean"] is None
    assert got[6]["clean"] == "already clean text"

    # idempotence: cleaning the cleaned column changes nothing
    once = clean_text(d).select("doc_id", F.col("clean").alias("text"))
    twice = {r["doc_id"]: r["clean"] for r in clean_text(once).collect()}
    assert twice == {k: v["clean"] for k, v in got.items()}


def test_webgraph_links_hostgraph_pagerank(spark):
    """Link extraction resolves absolute/scheme-relative/root-relative
    hrefs and NULLs the rest; the host graph counts resolvable pairs;
    PageRank puts the most-linked host first and sums to <= 1."""
    from ocr_poc_spark.operators.webgraph import (
        extract_links,
        host_graph,
        pagerank,
    )

    pages = spark.createDataFrame(
        [
            ("https://a.example/p1",
             b'<a href="https://hub.example/x">1</a>'
             b'<a href="//hub.example/y">2</a>'
             b'<a href="/local">3</a>'
             b'<a href="#frag">4</a><a href="mailto:z@q">5</a>'),
            ("https://b.example/p1", b'<a href="https://hub.example/z">1</a>'),
            ("https://hub.example/p1", b'<a href="https://a.example/">1</a>'),
        ],
        "url string, html binary",
    )
    links = extract_links(pages).collect()
    assert len(links) == 7
    by_href = {r["href"]: r["dst"] for r in links}
    assert by_href["https://hub.example/x"] == "https://hub.example/x"
    assert by_href["//hub.example/y"] == "https://hub.example/y"
    assert by_href["/local"] == "https://a.example/local"
    assert by_href["#frag"] is None and by_href["mailto:z@q"] is None

    g = {(r["src_host"], r["dst_host"]): r["n_links"]
         for r in host_graph(extract_links(pages)).collect()}
    assert g[("a.example", "hub.example")] == 2
    assert g[("a.example", "a.example")] == 1  # the root-relative self link
    assert g[("b.example", "hub.example")] == 1
    assert g[("hub.example", "a.example")] == 1

    edges = host_graph(extract_links(pages)).where("src_host != dst_host")
    pr = {r["host"]: r["rank"] for r in pagerank(edges, n_iter=5).collect()}
    assert max(pr, key=pr.get) == "hub.example"
    assert 0 < sum(pr.values()) <= 1.0 + 1e-9

    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edges, n_iter=0)


def test_extract_anchor_texts(spark):
    from ocr_poc_spark.operators.webgraph import extract_anchor_texts

    pages = spark.createDataFrame(
        [
            ("https://a.example/p",
             b'<a href="https://b.example/x" class="z"> Target Page </a>'
             b'<a href="/local">rel</a><a href="#f">skip</a>'
             b'<a href="https://c.example/y"></a>'),
        ],
        "url string, html binary",
    )
    got = {(r["dst"]): r["anchor"] for r in extract_anchor_texts(pages).collect()}
    assert got == {
        "https://b.example/x": "Target Page",
        "https://a.example/local": "rel",
        "https://c.example/y": "",
    }


def test_webgraph_href_anchored_to_a_tags(spark):
    """HREF_RE/ANCHOR_RE must count only real hyperlinks: data-href=
    and xhref= attributes, href on non-anchor tags (<link>, <base>,
    <area>), and <abbr ...> lookalikes are NOT links (ADVICE r4)."""
    from ocr_poc_spark.operators.webgraph import (
        extract_anchor_texts,
        extract_links,
    )

    pages = spark.createDataFrame(
        [
            ("https://a.example/p",
             b'<link href="https://cdn.example/style.css" rel="stylesheet">'
             b'<base href="https://base.example/">'
             b'<area href="https://map.example/z">'
             b'<div data-href="https://tracker.example/t">x</div>'
             b'<span xhref="https://fake.example/f">y</span>'
             b'<abbr title="https://abbr.example/">HTML</abbr>'
             b'<a data-href="https://tracker.example/u" '
             b'href="https://real.example/one">real one</a>'
             b'<A HREF="https://real.example/two">upper</A>'
             b'<a\nhref="https://real.example/three">newline</a>'),
        ],
        "url string, html binary",
    )
    links = extract_links(pages).collect()
    assert sorted(r["dst"] for r in links) == [
        "https://real.example/one",
        "https://real.example/three",
        "https://real.example/two",
    ]
    anchors = {r["dst"]: r["anchor"] for r in extract_anchor_texts(pages).collect()}
    assert anchors == {
        "https://real.example/one": "real one",
        "https://real.example/two": "upper",
        "https://real.example/three": "newline",
    }


def test_anchor_profile_topk_ties_and_corpus_join(spark):
    """Per-dst top-k with (count desc, anchor asc) tie-break, windowed
    inbound total over ALL phrases (not just top-k), and the host-level
    in_corpus marker."""
    import pytest

    from ocr_poc_spark.operators.webgraph import anchor_profile

    anchors = spark.createDataFrame(
        [
            # hub.example/p: 'home' x3, 'news' x2, 'a' x1, 'b' x1
            *[("https://s.example/1", "https://hub.example/p", "home")] * 3,
            *[("https://s.example/2", "https://hub.example/p", "news")] * 2,
            ("https://s.example/3", "https://hub.example/p", "a"),
            ("https://s.example/4", "https://hub.example/p", "b"),
            # tie.example/q: 'x' and 'y' both once -> anchor asc order
            ("https://s.example/5", "https://tie.example/q", "y"),
            ("https://s.example/6", "https://tie.example/q", "x"),
            # off.example/r: not in the corpus
            ("https://s.example/7", "https://off.example/r", "z"),
        ],
        "src string, dst string, anchor string",
    )
    docs = spark.createDataFrame(
        [("https://hub.example/any",), ("https://tie.example/other",)],
        "url string",
    )
    rows = anchor_profile(anchors, top_k=2, docs=docs).collect()
    by = {(r["dst"], r["rank"]): r for r in rows}
    assert len(rows) == 5  # 2 + 2 + 1
    hub1 = by[("https://hub.example/p", 1)]
    hub2 = by[("https://hub.example/p", 2)]
    assert (hub1["anchor"], hub1["n_anchor"]) == ("home", 3)
    assert (hub2["anchor"], hub2["n_anchor"]) == ("news", 2)
    assert hub1["n_links"] == 7  # all 4 phrases counted in the total
    assert by[("https://tie.example/q", 1)]["anchor"] == "x"
    assert by[("https://tie.example/q", 2)]["anchor"] == "y"
    assert hub1["in_corpus"] and by[("https://tie.example/q", 1)]["in_corpus"]
    assert not by[("https://off.example/r", 1)]["in_corpus"]

    # without docs the column is absent
    cols = anchor_profile(anchors, top_k=1).columns
    assert "in_corpus" not in cols

    with pytest.raises(ValueError, match="top_k"):
        anchor_profile(anchors, top_k=0)


def test_nb_classifier_separates_and_guards(spark):
    """Quality classifier: docs drawn from the positive vocabulary
    outscore docs from the negative vocabulary; every input doc gets a
    row (empty text scores at the bare prior); high scorers are kept,
    deep negatives dropped; empty corpora and a train/serve n_buckets
    mismatch fail loudly instead of silently mis-scoring."""
    import pytest

    from ocr_poc_spark.operators.classifier import nb_score, nb_train

    posv = "curated encyclopedia article with citations and prose"
    negv = "click here buy now free casino winner jackpot spam"
    rows = (
        [(i, f"{posv} item {i % 7}", "pos") for i in range(40)]
        + [(100 + i, f"{negv} offer {i % 5}", "neg") for i in range(40)]
        + [(999, "   ", "empty")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, cls string")
    model = nb_train(
        df.where("cls = 'pos'"), df.where("cls = 'neg'"), n_buckets=512
    )
    assert model.count() == 512  # full spine
    out = {r["doc_id"]: r for r in nb_score(df, model, n_buckets=512).collect()}
    assert len(out) == len(rows)  # one row per doc, incl. empty text
    assert out[999]["n_terms"] == 0
    pos_scores = [out[i]["score"] for i in range(40)]
    neg_scores = [out[100 + i]["score"] for i in range(40)]
    assert min(pos_scores) > 0 > max(neg_scores)
    assert all(out[i]["keep"] for i in range(40))
    # deep-negative docs are overwhelmingly dropped (the acceptance
    # arm admits at probability e^score ~ 0 here)
    assert sum(out[100 + i]["keep"] for i in range(40)) <= 2

    with pytest.raises(Exception, match="no n-grams"):
        nb_train(df.where("cls = 'empty'"), df, n_buckets=512).collect()
    with pytest.raises(Exception, match="n_buckets mismatch"):
        nb_score(df, model, n_buckets=1024).collect()
    with pytest.raises(ValueError):
        nb_train(df, df, alpha=0.0)


def test_bitext_mine_margin_semantics(spark):
    """Margin mining: a planted translation pair (same direction,
    small noise) is mined mutually; a HUB vector that is moderately
    close to everything is suppressed by the margin denominator even
    though its raw cosine clears the bar; too-small corpora and bad
    params fail loudly."""
    import pytest

    from ocr_poc_spark.operators.similarity import bitext_mine

    def v(*xs):
        return [float(x) for x in xs]

    # 6-dim toy space: src 0 and tgt 100 are near-identical (the true
    # pair); tgt 103 is a hub ~equally close to every src vector.
    src = spark.createDataFrame(
        [
            (0, v(10, 0, 0, 1, 0, 0)),
            (1, v(0, 10, 0, 0, 1, 0)),
            (2, v(0, 0, 10, 0, 0, 1)),
        ],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [
            (100, v(10, 0, 1, 1, 0, 0)),   # ~= src 0
            (101, v(0, 9, 1, 0, 1, 0)),    # ~= src 1
            (102, v(1, 0, 9, 0, 0, 1)),    # ~= src 2
            (103, v(5, 5, 5, 1, 1, 1)),    # hub: close to everyone
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        (r["src_id"], r["tgt_id"]): r
        for r in bitext_mine(
            src, tgt, k=2, margin_threshold=1.0, strategy="intersect"
        ).collect()
    }
    assert (0, 100) in out and (1, 101) in out and (2, 102) in out
    # every mined pair clears the margin bar and carries a cosine
    assert all(r["margin"] > 1.0 and r["cosine"] is not None for r in out.values())
    # the hub is nobody's mined partner: its neighbor average is high,
    # so no pair involving it survives the mutual-best margin cut
    assert not any(t == 103 for _, t in out)

    # forward mode yields one row per surviving source, a superset
    fwd = bitext_mine(src, tgt, k=2, margin_threshold=1.0).collect()
    assert len({r["src_id"] for r in fwd}) == len(fwd)
    assert set(out) <= {(r["src_id"], r["tgt_id"]) for r in fwd}

    with pytest.raises(ValueError, match="strategy"):
        bitext_mine(src, tgt, strategy="union")
    with pytest.raises(ValueError, match="k must be"):
        bitext_mine(src, tgt, k=0)
    with pytest.raises(Exception, match="fewer than k"):
        bitext_mine(src, tgt.limit(2), k=3).collect()


def test_bitext_mine_ann_candidates_and_skip(spark):
    """Production path: mining restricted to an ids-only candidate
    frame equals the exact path when the candidates cover the true
    k-NN sets; on_short='skip' drops under-connected vectors instead
    of raising."""
    import pytest

    from ocr_poc_spark.operators.similarity import bitext_mine

    src = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(6)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(100 + i, [float((i * 7 + j * 3) % 11 - 5 + (1 if j == 0 else 0))
                    for j in range(6)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    exact = sorted(
        map(tuple, bitext_mine(src, tgt, k=3, margin_threshold=1.0).collect())
    )
    # full candidate cover == exact
    cands = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    got = sorted(
        map(tuple, bitext_mine(
            src, tgt, k=3, margin_threshold=1.0, candidates=cands
        ).collect())
    )
    assert got == exact and len(exact) > 0
    # sparse candidates: one src has only 2 candidates -> raise mode
    # fails loudly, skip mode drops just that src
    sparse = cands.where(~((F.col("src_id") == 0) & (F.col("tgt_id") > 101)))
    with pytest.raises(Exception, match="fewer than k"):
        bitext_mine(src, tgt, k=3, candidates=sparse).collect()
    skipped = bitext_mine(
        src, tgt, k=3, margin_threshold=0.0, candidates=sparse, on_short="skip"
    ).collect()
    assert skipped and not any(r["src_id"] == 0 for r in skipped)
    with pytest.raises(ValueError, match="on_short"):
        bitext_mine(src, tgt, on_short="maybe")


def test_bitext_mine_duplicate_candidates_and_zero_candidate_raise(spark):
    """Round-5 review regressions: duplicate candidate pairs must not
    double-count a neighbor in the k-NN averages (margins identical to
    the deduped frame); a vector with ZERO candidates fails loudly in
    raise mode instead of silently vanishing."""
    import pytest

    from ocr_poc_spark.operators.similarity import bitext_mine

    src = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 7 + 1) for j in range(4)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(100 + i, [float((i * 5 + j) % 7 + 2) for j in range(4)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    cands = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    clean = sorted(map(tuple, bitext_mine(
        src, tgt, k=2, margin_threshold=0.0, candidates=cands
    ).collect()))
    doubled = sorted(map(tuple, bitext_mine(
        src, tgt, k=2, margin_threshold=0.0,
        candidates=cands.unionByName(cands),
    ).collect()))
    assert doubled == clean and len(clean) > 0

    # src 0 entirely absent from candidates: loud in raise mode,
    # dropped in skip mode
    no0 = cands.where("src_id <> 0")
    with pytest.raises(Exception, match="no usable candidates"):
        bitext_mine(src, tgt, k=2, candidates=no0).collect()
    skipped = bitext_mine(
        src, tgt, k=2, margin_threshold=0.0, candidates=no0, on_short="skip"
    ).collect()
    assert skipped and not any(r["src_id"] == 0 for r in skipped)


def test_hybrid_topk_rrf_fusion(spark):
    """Hybrid retrieval: a doc present in BOTH legs' top lists outranks
    docs present in one; a leg a doc missed contributes 0 (NULL rank);
    rrf = 1/(60+r_bm25) + 1/(60+r_cos) exactly; result is partition-
    independent and capped at top_n."""
    from ocr_poc_spark.operators.search import hybrid_topk

    docs = [
        (1, "spark join spark join spark join"),   # strong in both legs
        (2, "spark join plus other filler words"), # weaker, both legs
        (3, "unrelated tokens entirely different here"),  # neither leg
        (4, None),                                  # NULL text: no leg
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = hybrid_topk(d, "spark join", pool=10, top_n=10).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 3/4 never match the sparse leg; doc 3 may appear via the
    # dense leg (its hash vector has some cosine to the query) but a
    # two-leg doc must outrank every one-leg doc.
    assert rows[1]["bm25_rank"] is not None and rows[1]["cos_rank"] is not None
    assert out[0]["doc_id"] == 1
    assert 4 not in rows  # NULL text -> zero vector, no cosine, no terms
    # exact RRF arithmetic from the returned ranks
    for r in out:
        want = 0.0
        if r["bm25_rank"] is not None:
            want += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] is not None:
            want += 1.0 / (60 + r["cos_rank"])
        assert r["rrf_score"] == round(want, 6)
    # two-leg docs strictly above every single-leg doc at these sizes
    one_leg = [r for r in out if r["bm25_rank"] is None or r["cos_rank"] is None]
    two_leg = [r for r in out if r["bm25_rank"] is not None and r["cos_rank"] is not None]
    assert two_leg and all(
        t["rrf_score"] > o["rrf_score"] for t in two_leg for o in one_leg
    )
    # partition independence + top_n cap
    again = hybrid_topk(d.repartition(7), "spark join", pool=10, top_n=2).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out[:2]]


def test_quantize_embeddings_scale_invariant_retrieval(spark):
    """int8 quantization: cells are floor(v*127/maxabs) ints in
    [-127, 127], zero vectors quantize to zero cells with scale 0,
    and because cosine is scale-invariant, top-k retrieval over the
    quantized vectors closely tracks the exact float ranking."""
    import math

    import pytest

    from ocr_poc_spark.operators.similarity import (
        cosine_topk, quantize_embeddings,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),    # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
        (3, [-0.5, 0.25, 0.125, -1.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),    # zero vector
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = {r["vec_id"]: r for r in quantize_embeddings(d).collect()}
    assert q[0]["qvec"] == [127, 0, 0, 0] and q[0]["scale"] == 1.0
    # floor asymmetry: -0.5*127/1.0 = -63.5 -> -64; +0.25*127 -> 31
    assert q[3]["qvec"] == [-64, 31, 15, -127] and q[3]["scale"] == 1.0
    assert q[4]["qvec"] == [0, 0, 0, 0] and q[4]["scale"] == 0.0
    assert all(
        -127 <= c <= 127 for r in q.values() for c in r["qvec"]
    )

    # retrieval parity: quantized neighbor order == exact order here,
    # and the quantized cosine is within quantization error of exact
    exact = {
        (r["query_id"], r["rank"]): r
        for r in cosine_topk(d, query_ids=[0], k=3).collect()
    }
    qd = quantize_embeddings(d).select(
        "vec_id", F.col("qvec").alias("embedding")
    )
    quant = {
        (r["query_id"], r["rank"]): r
        for r in cosine_topk(qd, query_ids=[0], k=3).collect()
    }
    assert [exact[k]["neighbor_id"] for k in sorted(exact)] == \
           [quant[k]["neighbor_id"] for k in sorted(quant)]
    for k in exact:
        assert math.isclose(
            exact[k]["cosine"], quant[k]["cosine"], abs_tol=0.02
        )
    # zero vector is nobody's neighbor (cosine NULL contract)
    assert all(r["neighbor_id"] != 4 for r in exact.values())

    with pytest.raises(ValueError, match="bits"):
        quantize_embeddings(d, bits=1)


def test_ann_recall_audit(spark):
    """Recall audit: exact ground truth defines the denominator, a
    query the ANN missed scores 0, extra ANN-only queries are ignored,
    duplicate ANN rows don't double-count."""
    from ocr_poc_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21), (2, 21), (9, 90)],
        "query_id long, neighbor_id long",
    )
    out = {r["query_id"]: r for r in ann_recall(exact, approx).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_exact"], out[1]["n_hit"], out[1]["recall"]) == (2, 1, 0.5)
    assert (out[2]["n_exact"], out[2]["n_hit"], out[2]["recall"]) == (2, 2, 1.0)
    assert (out[3]["n_exact"], out[3]["n_hit"], out[3]["recall"]) == (1, 0, 0.0)


def test_ccnet_buckets_rank_terciles(spark):
    """Head/middle/tail: per-stratum thirds by ppl rank — fluent docs
    land head, gibberish lands tail; tiny strata drain to tail; NULL
    lang is its own stratum; under-2-token docs are excluded."""
    from ocr_poc_spark.operators.textstats import ccnet_buckets

    fluent = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # 6 fluent English docs (repeating shared bigrams -> low ppl) and
    # 3 gibberish ones (unique bigrams -> high ppl)
    for i in range(6):
        rows.append((i, "en", fluent))
    for i in range(6, 9):
        rows.append((i, "en", f"zzq{i} wfjx{i} qqv{i} xkcd{i} mmr{i}"))
    rows.append((20, None, fluent))          # NULL stratum, n=1
    rows.append((21, "fr", "solo"))          # 1 token: no LM row
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in ccnet_buckets(d).collect()}
    assert 21 not in out                      # no bigrams -> excluded
    assert out[20]["bucket"] == "tail"        # n=1 stratum drains to tail
    en = [r for r in out.values() if r["lang"] == "en"]
    assert len(en) == 9
    buckets = {b: [r["doc_id"] for r in en if r["bucket"] == b]
               for b in ("head", "middle", "tail")}
    assert len(buckets["head"]) == 3 and len(buckets["middle"]) == 3
    assert len(buckets["tail"]) == 3
    # every gibberish doc must rank worse than every fluent doc
    assert set(buckets["tail"]) == {6, 7, 8}
    # determinism under repartition
    again = {r["doc_id"]: r["bucket"]
             for r in ccnet_buckets(d.repartition(7)).collect()}
    assert again == {k: v["bucket"] for k, v in out.items()}


def test_kn_lm_scores_contract(spark):
    """Kneser-Ney semantics on a hand-checkable corpus: the KN
    probability of a seen bigram matches the closed form; the
    francisco effect holds (a frequent word locked to one context gets
    LOWER continuation probability than a promiscuous one); unseen
    contexts back off to the continuation distribution; < 2-token docs
    yield no row; bad discount raises."""
    import math

    import pytest

    from ocr_poc_spark.operators.textstats import kn_lm_scores

    # "san francisco" x3 locks francisco to one context; "nice" follows
    # three different words.
    rows = [
        (1, "san francisco san francisco san francisco"),
        (2, "very nice truly nice really nice"),
        (3, "one"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in kn_lm_scores(d).collect()}
    assert 3 not in out
    assert out[1]["n_bigrams"] == 5 and out[2]["n_bigrams"] == 5

    # hand mirror for doc 1's "san francisco" bigram:
    # c(san francisco)=3, c(san .)=3, N1+(san .)=1
    # Pc(francisco) = (N1+(. francisco)+0.5)/(n_types+0.5*(V+1))
    # corpus bigrams: (san,francisco)x3,(francisco,san)x2,(very,nice),
    # (nice,truly),(truly,nice),(nice,really),(really,nice)
    # n_types=7, V=7 tokens distinct: san francisco very nice truly really one
    pc_fr = (1 + 0.5) / (7 + 0.5 * (7 + 1))
    p_sf = (3 - 0.75) / 3 + (0.75 * 1 / 3) * pc_fr
    # doc 1 = 5 bigrams: (s,f) x3 at p_sf, (f,s) x2
    pc_san = (1 + 0.5) / (7 + 0.5 * 8)
    p_fs = (2 - 0.75) / 2 + (0.75 * 1 / 2) * pc_san
    h = -(3 * math.log2(p_sf) + 2 * math.log2(p_fs)) / 5
    assert out[1]["cross_entropy"] == round(h, 4)
    assert out[1]["ppl"] == round(2 ** h, 4)

    # francisco effect: nice (3 contexts) has higher Pc than francisco
    # (1 context) even though both appear 3 times -> scoring a doc of
    # unseen-context bigrams ending in each word favors nice.
    probe = spark.createDataFrame(
        [(10, "one francisco"), (11, "one nice")], "doc_id long, text string"
    )
    scored = {r["doc_id"]: r["ppl"] for r in
              kn_lm_scores(probe, train_df=d).collect()}
    assert scored[11] < scored[10]

    with pytest.raises(ValueError, match="discount"):
        kn_lm_scores(d, discount=1.5)


def test_bitext_url_candidates_ccaligned_semantics(spark):
    """URL alignment: language-marked paths sharing the stripped key
    pair across languages; unmarked urls never pair; NULL lang/url
    skipped; one row per unordered pair (lang_a < lang_b)."""
    from ocr_poc_spark.operators.similarity import bitext_url_candidates

    rows = [
        (1, "https://s.example/en/art/7", "en"),
        (2, "https://s.example/fr/art/7", "fr"),
        (3, "https://s.example/de/art/7", "de"),
        (4, "https://s.example/en/art/8", "en"),   # different article
        (5, "https://s.example/about", "en"),      # unmarked: no key
        (6, "https://s.example/about", "fr"),      # unmarked: no pair
        (7, None, "en"),
        (8, "https://s.example/es/art/7", None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string, lang string")
    out = {(r["id_a"], r["id_b"]) for r in bitext_url_candidates(d).collect()}
    # article 7 in en/fr/de -> C(3,2) pairs, lang-ordered
    assert out == {(3, 1), (3, 2), (1, 2)}  # de<en, de<fr, en<fr
    rowsd = {(r["id_a"], r["id_b"]): r for r in bitext_url_candidates(d).collect()}
    assert rowsd[(3, 1)]["lang_a"] == "de" and rowsd[(3, 1)]["lang_b"] == "en"
    assert rowsd[(1, 2)]["key"] == "https://s.example/art/7"


def test_tokenizer_fertility_audit(spark):
    """Fertility semantics under a tiny explicit vocab: full-word hits
    give fertility 1, out-of-vocab words fall back to 1 char/token
    (fertility == word length), wordless docs yield NULLs, and the
    greedy longest match wins over shorter prefixes."""
    from ocr_poc_spark.operators.textstats import tokenizer_fertility

    vocab = ["ab", "abc", "c", "x"]
    rows = [
        (1, "abc abc"),     # longest match 'abc': 1 token each
        (2, "abx"),         # 'ab' + 'x': 2 tokens
        (3, "qq"),          # OOV: 2 x 1-char fallback
        (4, "   "),         # wordless
        (5, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tokenizer_fertility(d, vocab=vocab).collect()}
    assert (out[1]["n_words"], out[1]["n_subtokens"]) == (2, 2)
    assert out[1]["fertility"] == 1.0 and out[1]["chars_per_token"] == 3.0
    assert (out[2]["n_words"], out[2]["n_subtokens"]) == (1, 2)
    assert out[2]["fertility"] == 2.0 and out[2]["chars_per_token"] == 1.5
    assert out[3]["fertility"] == 2.0 and out[3]["chars_per_token"] == 1.0
    assert out[4]["n_words"] == 0 and out[4]["fertility"] is None
    assert out[4]["chars_per_token"] is None
    assert out[5]["fertility"] is None


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing invariants: density <= 1 fingerprint per window slot,
    every selected hash is a real shingle hash at its position, short
    docs collapse to one window, and the coverage GUARANTEE holds —
    two docs sharing a >= k+window-1-token substring share at least
    one selected fingerprint hash."""
    from ocr_poc_spark.operators.textstats import winnow_fingerprints

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # 10 tokens >= 5+4-1
    rows = [
        (1, f"aa bb {shared} cc"),
        (2, f"{shared} zz yy xx"),
        (3, "only four little words"),   # < k shingles... 4 words, k=5 -> none
        (4, "five little words right here"),  # exactly 1 shingle
        (5, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(d, k=5, window=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["hash"]))
    assert 3 not in by_doc and 5 not in by_doc
    assert len(by_doc[4]) == 1 and next(iter(by_doc[4]))[0] == 0
    # guarantee: docs 1 and 2 share a fingerprint HASH
    h1 = {h for _, h in by_doc[1]}
    h2 = {h for _, h in by_doc[2]}
    assert h1 & h2
    # density: n_windows = n_shingles - window + 1; selections <= that
    n_sh_1 = 13 - 5 + 1  # 13 tokens
    assert len(by_doc[1]) <= n_sh_1 - 4 + 1
    # determinism under partitioning
    again = sorted(tuple(r) for r in
                   winnow_fingerprints(d.repartition(5), k=5, window=4).collect())
    assert again == sorted(tuple(r) for r in out)
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(d, k=1)


def test_find_text_positions(spark):
    """Corpus grep: exact char offsets, multiple occurrences indexed in
    order, case-sensitive, split (non-overlapping) semantics, no rows
    for clean/NULL docs, empty needle raises."""
    import pytest

    from ocr_poc_spark.operators.search import find_text

    rows = [
        (1, "abc NEEDLE def NEEDLE x"),
        (2, "needle lowercase only"),
        (3, None),
        (4, "NEEDLENEEDLE"),
        (5, "ends with NEEDLE"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["occ_idx"], r["pos"])
        for r in find_text(d, "NEEDLE").collect()
    )
    assert out == [
        (1, 0, 4), (1, 1, 15),
        (4, 0, 0), (4, 1, 6),
        (5, 0, 10),
    ]
    # positions really point at the needle
    assert rows[0][1][4:10] == "NEEDLE" and rows[0][1][15:21] == "NEEDLE"
    # metacharacters are literal
    meta = spark.createDataFrame([(9, "a.c a.c abc")], "doc_id long, text string")
    got = [(r["occ_idx"], r["pos"]) for r in find_text(meta, "a.c").collect()]
    assert got == [(0, 0), (1, 4)]
    with pytest.raises(ValueError):
        find_text(d, "")


def test_find_text_random_mirror(spark):
    """Randomized property check: find_text positions equal a pure-
    Python str.find scan on 200 seeded random docs (one Spark job)."""
    import random

    from ocr_poc_spark.operators.search import find_text

    rng = random.Random(42)
    alphabet = ["ab", "NEEDLE", "c", " ", "NEED", "LE", "abcNEEDLE"]
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["occ_idx"], r["pos"])
        for r in find_text(d, "NEEDLE").collect()
    )
    want = []
    for i, t in rows:
        start, k = 0, 0
        while True:
            p = t.find("NEEDLE", start)
            if p < 0:
                break
            want.append((i, k, p))
            start, k = p + 6, k + 1   # non-overlapping, leftmost-first
    assert got == sorted(want) and len(got) > 50


def test_strip_repeated_lines_random_mirror(spark):
    """Randomized property check: the HOF rewrite equals a pure-Python
    first-occurrence filter on 200 seeded random multi-line docs."""
    import random

    from ocr_poc_spark.operators.curation import strip_repeated_lines

    rng = random.Random(7)
    lines_pool = ["Nav Home", "nav home ", "body", "", "  ", "More",
                  "x y", "Nav Home\r", "\tbody", "\r", "\t "]
    rows = [
        (i, "\n".join(rng.choice(lines_pool)
                      for _ in range(rng.randint(1, 10))))
        for i in range(200)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in strip_repeated_lines(d).collect()}

    def mirror(t):
        seen, kept = set(), []
        for l in t.split("\n"):
            norm = l.strip().lower()   # python strip == full whitespace
            if norm == "":
                kept.append(l)
            elif norm not in seen:
                seen.add(norm)
                kept.append(l)
        return "\n".join(kept), len(t.split("\n")) - len(kept)

    for i, t in rows:
        assert got[i] == mirror(t), (i, t)
