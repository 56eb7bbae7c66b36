"""Warm-JVM wall probe for the relational cascade: N passes over the
same 30k-page fixture in one JVM; per-pass wall + checkpoint-phase
split. Pass A/B env CASCADE_VARIANT to compare code paths interleaved.

Usage: python scripts/relational_probe.py [n_pages] [n_passes]
"""
import sys, time
sys.path.insert(0, ".")

from ocr_poc_spark.session import get_spark
from ocr_poc_spark.fixtures import write_pages_parquet
from ocr_poc_spark.plans.job import extract_relational
import tempfile, os

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

tmp = tempfile.mkdtemp()
pages_path = os.path.join(tmp, "pages.parquet")
write_pages_parquet(pages_path, n_pages, seed=42)

spark = get_spark("relational_probe", cpus=32)
pages = (
    spark.read.option("mergeSchema", "false").parquet(pages_path)
    .repartition(64)
)

for i in range(n_passes):
    t0 = time.perf_counter()
    ext = extract_relational(pages, spark)
    t1 = time.perf_counter()
    out = os.path.join(tmp, f"out{i}")
    ext.write.mode("overwrite").parquet(out)
    t2 = time.perf_counter()
    n = spark.read.parquet(out).count()
    print(f"pass {i}: build={t1-t0:6.1f}s  exec+write={t2-t1:6.1f}s  "
          f"total={t2-t0:6.1f}s  rows={n}", flush=True)
