"""WARC source: parse Common-Crawl-style archives into the pages frame
and drive the extraction pipeline over them."""

import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _record(rtype, uri, body, date="2025-03-01T00:00:00Z"):
    headers = [b"WARC/1.0", f"WARC-Type: {rtype}".encode()]
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}".encode())
    headers.append(f"WARC-Date: {date}".encode())
    headers.append(f"Content-Length: {len(body)}".encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def _fixture_pages(n):
    """Repo fixture pages (they pass the extraction quality gate by
    construction); html-payload ones only (no pdf/poison)."""
    from ocr_poc_spark.fixtures import gen_pages

    return [
        r for r in gen_pages(n + 6, seed=31)
        if bytes(r["html"]).lstrip()[:1] == b"<"
    ][:n]


def _make_warc_gz(path: str, n: int = 5) -> dict[str, bytes]:
    fix = _fixture_pages(n)
    assert len(fix) == n
    pages = {r["url"]: bytes(r["html"]) for r in fix}
    records = [
        _record("warcinfo", None, b"software: test\r\n"),
        _record("response", fix[0]["url"], _http(bytes(fix[0]["html"]))),
        _record("request", fix[0]["url"], b"GET /x HTTP/1.1\r\n"),
        # ftp URI: not a page; bad Content-Length record: skipped
        _record("response", "ftp://c.example/x", _http(b"nope")),
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n",
    ]
    records += [
        _record("response", r["url"], _http(bytes(r["html"]))) for r in fix[1:]
    ]
    # one gzip member per record, like Common Crawl
    with open(path, "wb") as fh:
        for r in records:
            fh.write(gzip.compress(r))
    return pages


def test_warc_parse_and_read(spark, tmp_path):
    from ocr_poc_spark.sources.pages import read_pages

    p = str(tmp_path / "seg-00000.warc.gz")
    pages = _make_warc_gz(p, n=7)
    df = read_pages(spark, f"warc:{p}")
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == set(pages)
    for url, body in pages.items():
        assert bytes(rows[url]["html"]) == body  # HTTP headers stripped
    assert all(str(r["warc_ts"]).startswith("2025-03-01") for r in rows.values())


def test_warc_uncompressed_and_suffix_dispatch(spark, tmp_path):
    from ocr_poc_spark.sources.pages import read_pages

    raw = _record(
        "response", "https://p.example/q", _http(b"<html><p>plain warc</p></html>")
    )
    p = str(tmp_path / "seg.warc")
    with open(p, "wb") as fh:
        fh.write(raw)
    rows = read_pages(spark, p).collect()  # suffix dispatch, no prefix
    assert len(rows) == 1 and rows[0]["url"] == "https://p.example/q"
    assert bytes(rows[0]["html"]) == b"<html><p>plain warc</p></html>"


def test_warc_feeds_extraction_end_to_end(spark, tmp_path):
    """Extraction over the WARC source must be byte-identical to
    extraction over the same pages via the parquet-frame path."""
    from ocr_poc_spark.plans.job import extract_fused
    from ocr_poc_spark.sources.pages import read_pages

    p = str(tmp_path / "seg.warc.gz")
    pages = _make_warc_gz(p, n=5)
    out = extract_fused(read_pages(spark, f"warc:{p}")).collect()
    assert len(out) == len(pages)
    # fixture corpora legitimately contain sub-quality pages; the
    # contract here is byte-parity with the parquet path, verdicts
    # included
    assert sum(r["success"] for r in out) >= 3
    fix = {r["url"]: r for r in _fixture_pages(5)}
    direct = spark.createDataFrame(
        [(u, fix[u]["warc_ts"], fix[u]["html"], "", fix[u]["lang"])
         for u in sorted(pages)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    exp = {r["url"]: (r["title"], r["body_text"], r["quality_score"])
           for r in extract_fused(direct).collect()}
    got = {r["url"]: (r["title"], r["body_text"], r["quality_score"])
           for r in out}
    assert got == exp


def test_warc_parser_malformed_records_do_not_drop_followers():
    """Negative Content-Length must not swallow the rest of the
    archive; a record with unparseable length whose BODY mentions
    'WARC/1.0' mid-prose must not desynchronize the head scan."""
    from ocr_poc_spark.sources.warc import parse_warc_bytes

    good1 = _record("response", "https://g1.example/", _http(b"<html>g1</html>"))
    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n"
        b"Content-Length: -1\r\n\r\nxx\r\n\r\n"
    )
    # no Content-Length: body is walked by the head scan; the quoted
    # "WARC/1.0 is a format" prose line must not parse as a record head
    nolen_body = b"some text\r\nWARC/1.0 is a format\r\nmore\r\n"
    nolen = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://nolen.example/\r\n\r\n" + nolen_body + b"\r\n\r\n"
    )
    good2 = _record("response", "https://g2.example/", _http(b"<html>g2</html>"))
    out = list(parse_warc_bytes(good1 + neg + nolen + good2))
    assert [u for u, _, _ in out] == ["https://g1.example/", "https://g2.example/"]


def test_warc_bounded_batches_preserve_all_records(spark, tmp_path, monkeypatch):
    """The streaming reader must flush bounded batches without losing
    or duplicating records: with WARC_BATCH_RECORDS monkeypatched to 3,
    10 records arrive intact (order-insensitive byte parity)."""
    import ocr_poc_spark.sources.warc as warc_mod
    from ocr_poc_spark.sources.pages import read_pages

    monkeypatch.setattr(warc_mod, "WARC_BATCH_RECORDS", 3)
    p = str(tmp_path / "seg-batch.warc.gz")
    pages = _make_warc_gz(p, n=10)
    got = {
        r["url"]: bytes(r["html"])
        for r in read_pages(spark, p).collect()
    }
    want = {
        u: b[b.find(b"\r\n\r\n") + 4:] if b.find(b"\r\n\r\n") >= 0 else b
        for u, b in {u: _http(v) for u, v in pages.items()}.items()
    }
    assert got == want


def test_warc_streaming_gzip_matches_whole_buffer_parse(tmp_path):
    """parse_warc_bytes over the gzip member chain (incremental
    GzipFile) equals parsing the pre-decompressed buffer."""
    import gzip as _gz

    from ocr_poc_spark.sources.warc import parse_warc_bytes

    fix = _fixture_pages(4)
    recs = [_record("response", r["url"], _http(bytes(r["html"]))) for r in fix]
    gz = b"".join(_gz.compress(r) for r in recs)
    plain = b"".join(recs)
    assert list(parse_warc_bytes(gz)) == list(parse_warc_bytes(plain))
