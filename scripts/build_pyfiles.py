"""Package the engine for spark-submit --py-files (north_rule packaging).

    python scripts/build_pyfiles.py          -> dist/ocr_poc_spark.zip
    spark-submit --py-files dist/ocr_poc_spark.zip \
        --master <cluster> run_job.py --input iceberg:db.pages --out s3://...

The zip contains only the package sources (no tests/fixtures caches).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "ocr_poc_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "ocr_poc_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
