"""Ad-hoc parity harness: relational cascade vs sequential kernel.

Usage: python scripts/parity_check.py [n_pages]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ocr_poc_spark.extractor import ALL_FIELDS, extract_document
from ocr_poc_spark.fixtures import gen_pages
from ocr_poc_spark.operators.cascade import run_cascade
from ocr_poc_spark.operators.parse import parse_pages
from ocr_poc_spark.session import get_spark


def kernel_row(r):
    res = extract_document(r["url"], r["html"])
    d = {
        "url": res.url,
        "doc_kind": res.doc_kind,
        "success": res.success,
        "message": res.message,
        "quality_score": res.quality_score,
        "confidence": res.confidence,
        "raw_text": res.raw_text,
        "body_text": res.body_text,
        "spans": [tuple(s) for s in res.spans],
        "anchors_detected": dict(res.anchors_detected),
        "n_blocks": res.n_blocks,
    }
    for f in ALL_FIELDS:
        d[f] = res.fields.get(f)
    return d


def main(n=120):
    rows = gen_pages(n, seed=42)
    expected = {r["url"]: kernel_row(r) for r in rows}

    spark = get_spark("parity", cpus=8)
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    parsed = parse_pages(pages)
    got = {r["url"]: r.asDict(recursive=True) for r in run_cascade(parsed, spark).collect()}

    assert set(got) == set(expected), (len(got), len(expected))
    n_bad = 0
    cols = [
        "doc_kind", "success", "message", "quality_score", "confidence",
        "raw_text", *ALL_FIELDS, "body_text", "n_blocks", "anchors_detected",
    ]
    for url, exp in expected.items():
        g = got[url]
        for c in cols:
            gv = g[c]
            ev = exp[c]
            if gv != ev:
                n_bad += 1
                print(f"MISMATCH {url} col={c}\n  kernel={ev!r}\n  spark ={gv!r}")
                if n_bad > 10:
                    sys.exit(1)
        gs = [(s["field"], s["start"], s["end"]) for s in (g["spans"] or [])]
        if gs != exp["spans"]:
            n_bad += 1
            print(f"MISMATCH {url} col=spans\n  kernel={exp['spans']!r}\n  spark ={gs!r}")
            if n_bad > 10:
                sys.exit(1)
    print(f"checked {len(expected)} urls, {n_bad} mismatches")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
