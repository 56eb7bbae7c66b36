"""Web-graph construction from crawled pages: link extraction, the
host-level link graph, and PageRank over it — the crawl-prioritization
products a web-scale pipeline derives from the same pages it extracts
text from (Common Crawl publishes exactly this host-level graph with
centrality scores; public artifact).

Scale notes (100 TB):
- extract_links is map-only over the page scan (regexp over the
  decoded payload; no UDF); only (src_host, dst_host) pairs — never
  page bytes — reach the host_graph aggregation, whose partial
  (map-side) combine collapses each page's links before the one
  shuffle on the uniform host key.
- pagerank is the same fixed-iteration discipline as
  dedup.connected_components: per-round localCheckpoint stops lineage
  growth, every shuffle carries (host, double) rows, and the
  iteration count is FIXED (deterministic output, no driver-side
  convergence reads beyond the bounded node count).

Reference parity: the reference is a single-document service with no
corpus-level products; the link graph is LLM-pipeline/crawl breadth
(SURVEY §2 beyond-reference suite), sibling of crawl.crawl_churn_stats
(both feed the recrawl scheduler).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .hoststats import host_of

# Anchored to <a> tags: a bare 'href="..."' would also swallow
# data-href=/xhref= attributes and href on non-hyperlink tags (<link>,
# <base>, <area>) plus commented-out markup — counting non-hyperlink
# references as links. '<a\\s' requires a real anchor tag (and rejects
# <abbr>/<address>); the (?<=\\s) lookbehind requires an attribute
# boundary immediately before href so 'data-href' can't sneak in via
# the lazy [^>]*?. Known residual: quoted '>' inside attribute values
# and <a href> inside comments/scripts — acceptable for link counting.
HREF_RE = '(?i)<a\\s[^>]*?(?<=\\s)href="([^"]*)"'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per href occurrence: (src, href, dst) where dst is the
    resolved absolute url — absolute http(s) hrefs pass through,
    scheme-relative (//host/p) get https, root-relative (/p) resolve
    against the source host; anything else (fragments, mailto:,
    path-relative) yields dst NULL (counted, never guessed). The html
    column may be binary (utf-8 cast; href attributes are ASCII in
    practice — a mojibake href fails the absolute/relative tests and
    lands in the NULL bucket, never a fabricated host). Double-quoted
    href attributes only, the overwhelmingly dominant form."""
    html_str = F.col(html_col).cast("string")
    base = pages.select(
        F.col(url_col).alias("src"),
        host_of(url_col).alias("_src_host"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(HREF_RE), F.lit(1))
        ).alias("href"),
    )
    h = F.col("href")
    dst = (
        F.when(h.rlike("^https?://"), h)
        .when(h.startswith("//"), F.concat(F.lit("https:"), h))
        .when(
            h.startswith("/") & (F.col("_src_host") != ""),
            F.concat(F.lit("https://"), F.col("_src_host"), h),
        )
    )
    return base.select("src", "href", dst.alias("dst"))


def host_graph(links: DataFrame) -> DataFrame:
    """The host-level link graph: (src_host, dst_host, n_links) over
    the resolvable links, empty-host rows dropped. Self-loops are kept
    (intra-site links are most links; callers filter when ranking)."""
    return (
        links.where(F.col("dst").isNotNull())
        .select(
            host_of("src").alias("src_host"),
            host_of("dst").alias("dst_host"),
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a (src, dst[, weight]) edge list:
    rank = (1-d)/N + d * sum over in-edges of rank_src * w / outdeg_src
    (outdeg = sum of outgoing weights). Nodes with no in-edges settle
    at (1-d)/N; dangling mass is NOT redistributed (the simple,
    deterministic variant, exactly recomputable in SQL). Note the
    omission is an approximation, not order-preserving in general: the
    uniform mass added at iteration k propagates NON-uniformly through
    the link matrix in later iterations, so rankings can differ from
    true PageRank — in practice the differences are small on graphs
    whose dangling mass is a modest fraction, which is the regime a
    host graph built from its own crawl's edges sits in. Returns
    (host, rank) for every node appearing as src or dst.

    Deterministic by construction: fixed n_iter, no sampling, no
    convergence probe; per-iteration localCheckpoint bounds the plan.
    Float contract: summation order across engines differs in the last
    ulps — consumers compare at round-6 like every ratio column."""
    if n_iter < 1:
        raise ValueError("pagerank: n_iter must be >= 1")
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w.cast("double").alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    ).localCheckpoint(eager=True)
    n = nodes.count()  # bounded: one row per HOST, not per page
    outdeg = e.groupBy("u").agg(F.sum("w").alias("outw"))
    base = float(1.0 - damping) / n
    ranks = nodes.select("u", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, "u")
            .join(outdeg, "u")
            .select(
                F.col("v").alias("u"),
                (F.col("rank") * F.col("w") / F.col("outw")).alias("c"),
            )
            .groupBy("u")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contrib, "u", "left").select(
            "u",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks.select(F.col("u").alias("host"), "rank")


# Same <a>-tag anchoring as HREF_RE (see its comment); group 2 is the
# inner text up to the next tag.
ANCHOR_RE = '(?i)<a\\s[^>]*?(?<=\\s)href="([^"]*)"[^>]*>([^<]*)<'


def extract_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor) per resolvable link: the anchor-text corpus —
    the classic relevance-training signal (anchor text describes the
    TARGET page; public lineage from web-IR literature). Two aligned
    regexp_extract_all passes (hrefs, inner texts) zip positionally —
    same match set by construction, no UDF; resolution and host rules
    are extract_links' (non-resolvable hrefs drop out; empty anchors
    kept — an image link's empty text is information too)."""
    html_str = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), F.lit(2)).alias("anchor"),
    )
    base = pages.select(
        F.col(url_col).alias("src"),
        host_of(url_col).alias("_src_host"),
        F.explode(pairs).alias("_p"),
    ).select(
        "src",
        "_src_host",
        F.col("_p.href").alias("href"),
        F.trim(F.col("_p.anchor")).alias("anchor"),
    )
    h = F.col("href")
    dst = (
        F.when(h.rlike("^https?://"), h)
        .when(h.startswith("//"), F.concat(F.lit("https:"), h))
        .when(
            h.startswith("/") & (F.col("_src_host") != ""),
            F.concat(F.lit("https://"), F.col("_src_host"), h),
        )
    )
    return base.select("src", dst.alias("dst"), "anchor").where(
        F.col("dst").isNotNull()
    )


def anchor_profile(
    anchors: DataFrame,
    top_k: int = 3,
    docs: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Aggregate the raw (src, dst, anchor) corpus into the consumable
    per-TARGET artifact: for every dst url, its top_k most frequent
    anchor phrases with counts — the classic web-IR relevance signal
    (anchor text describes the target page; inbound anchors are a
    free-text summary of what the web calls that document).

    Returns (dst, rank, anchor, n_anchor, n_links[, in_corpus]):
      rank        1..top_k by (count desc, anchor asc) — deterministic
      n_anchor    occurrences of THIS phrase pointing at dst
      n_links     total inbound links to dst (all phrases, not top-k)
      in_corpus   only when ``docs`` is given: whether dst's host is a
                  host the extracted corpus has pages on — joining the
                  relevance signal back onto the crawl, so a consumer
                  can split "anchors describing OUR documents" from
                  dangling references.

    Scale shape: the heavy reduction is the (dst, anchor) groupBy —
    map-side partial aggregation collapses each task's repeats before
    the one shuffle on the (dst, anchor) key (finer and more uniform
    than dst alone). The per-dst window then ranks ALREADY-AGGREGATED
    rows: its partition size is the number of DISTINCT phrases aimed at
    a dst, not the inbound degree — a 10^8-inlink hub with boilerplate
    anchors ("home", site name) collapses to a handful of rows before
    any sort. No global (un-partitioned) window anywhere. n_links rides
    the same dst-partitioned window (sum over the aggregated counts) —
    zero extra exchanges beyond the rank's. The optional corpus join is
    host-level: distinct corpus hosts are tiny relative to the anchor
    table and broadcast."""
    if top_k < 1:
        raise ValueError("anchor_profile: top_k must be >= 1")
    from pyspark.sql import Window

    counts = anchors.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n_anchor")
    )
    w = Window.partitionBy("dst")
    ranked = (
        counts.withColumn(
            "rank",
            F.row_number().over(
                w.orderBy(F.desc("n_anchor"), F.asc("anchor"))
            ),
        )
        .withColumn("n_links", F.sum("n_anchor").over(w))
        .where(F.col("rank") <= top_k)
    )
    out = ranked.select(
        "dst", F.col("rank").cast("int").alias("rank"), "anchor",
        "n_anchor", "n_links",
    )
    if docs is not None:
        hosts = (
            docs.select(host_of(url_col).alias("_h"))
            .where(F.col("_h") != "")
            .distinct()
        )
        out = out.join(
            F.broadcast(hosts), host_of("dst") == F.col("_h"), "left"
        ).select(
            "dst", "rank", "anchor", "n_anchor", "n_links",
            F.col("_h").isNotNull().alias("in_corpus"),
        )
    return out
