"""Byte-identical parity: relational Catalyst cascade AND fused map-only
path vs the sequential oracle, per url on every column (the north_rule's
"byte-identical extracted text per url" gate)."""

from ocr_poc_spark.operators.cascade import run_cascade
from ocr_poc_spark.operators.parse import explode_blocks, parse_pages
from ocr_poc_spark.plans.job import extract_fused

from conftest import assert_matches_oracle


def test_parse_stage_matches_kernel(spark, pages_df, fixture_rows):
    from ocr_poc_spark.extractor import sniff_and_parse

    parsed = {r["url"]: r for r in parse_pages(pages_df).collect()}
    for row in fixture_rows[:40]:
        blocks, kind = sniff_and_parse(row["html"])
        got = parsed[row["url"]]
        assert got["doc_kind"] == kind
        gb = [b.asDict() for b in got["blocks"]]
        assert len(gb) == len(blocks)
        for g, e in zip(gb, blocks):
            assert g["text"] == e.text and g["idx"] == e.idx
            assert g["score"] == e.score and g["x"] == e.x and g["y"] == e.y
            assert g["char_offset"] == e.char_offset
            assert g["boiler"] == e.boiler and g["tag_path"] == e.tag_path


def test_explode_blocks_columns(spark, pages_df):
    blocks = explode_blocks(parse_pages(pages_df.limit(10)))
    cols = set(blocks.columns)
    assert {"url", "doc_kind", "idx", "text", "score", "x", "y",
            "char_offset", "n_chars", "link_density", "boiler"} <= cols


def test_relational_cascade_matches_oracle(spark, pages_df, oracle_results):
    got = run_cascade(parse_pages(pages_df), spark).collect()
    assert_matches_oracle(got, oracle_results)


def test_fused_path_matches_oracle(spark, pages_df, oracle_results):
    got = extract_fused(pages_df).collect()
    assert_matches_oracle(got, oracle_results)


def test_parse_scan_prunes_columns(spark, tmp_path):
    """Column pruning must reach the parquet scan: the parse stage reads
    only (url, html) — at 100TB the heavy binary column is the only
    required read and text/lang/warc_ts are never materialised."""
    from ocr_poc_spark.fixtures import write_pages_parquet

    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(p, 20, seed=5)
    parsed = parse_pages(spark.read.parquet(p))
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    m = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert m, plan
    schema_line = m[0]
    assert "url" in schema_line and "html" in schema_line
    assert "warc_ts" not in schema_line and "lang" not in schema_line
