"""Warm-JVM wall probe for the relational cascade: N passes over the
same 30k-page fixture in one JVM; per-pass wall + per-checkpoint split
(parsed / annotated / hits / all_values barriers are serial driver-side
waits, so their walls + the final exec+write account for the total).

Usage: python scripts/relational_probe.py [n_pages] [n_passes]
Env:   PROBE_CONF="k=v;k=v"  extra SparkSession conf (e.g. codegen knobs)
"""
import os
import sys
import time

sys.path.insert(0, ".")

from ocr_poc_spark.session import get_spark
from ocr_poc_spark.fixtures import write_pages_parquet
from ocr_poc_spark.plans.job import parse_pages
from ocr_poc_spark.operators.cascade import run_cascade
import tempfile

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

extra = {}
for kv in os.environ.get("PROBE_CONF", "").split(";"):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra[k.strip()] = v.strip()

tmp = tempfile.mkdtemp()
pages_path = os.path.join(tmp, "pages.parquet")
write_pages_parquet(pages_path, n_pages, seed=42)

spark = get_spark("relational_probe", cpus=32, extra_conf=extra)
if extra:
    print(f"extra conf: {extra}", flush=True)
pages = (
    spark.read.option("mergeSchema", "false").parquet(pages_path)
    .repartition(64)
)

ab = os.environ.get("PROBE_AB") == "1"
# PROBE_AB_CONF="spark.sql.codegen.hugeMethodLimit=65535|8000": flip a
# runtime SQL conf between passes (interleaved, same JVM).
ab_conf = os.environ.get("PROBE_AB_CONF", "")

for i in range(n_passes):
    if ab:
        # Interleave variants within one JVM (the only timing comparison
        # this box's load spikes allow): even passes = default, odd =
        # the variant named in PROBE_AB_VARIANT (default fused_claims).
        variant = os.environ.get("PROBE_AB_VARIANT", "fused_claims") if i % 2 else ""
        os.environ["CASCADE_VARIANT"] = variant
        print(f"variant: {variant or 'default'}", flush=True)
    if ab_conf:
        key, vals = ab_conf.split("=", 1)
        val = vals.split("|")[i % len(vals.split("|"))]
        spark.conf.set(key, val)
        print(f"conf: {key}={val}", flush=True)
    timings: dict = {}
    t0 = time.perf_counter()
    ext = run_cascade(parse_pages(pages), spark, timings=timings)
    t1 = time.perf_counter()
    out = os.path.join(tmp, f"out{i}")
    ext.write.mode("overwrite").parquet(out)
    t2 = time.perf_counter()
    n = spark.read.parquet(out).count()
    split = "  ".join(f"{k}={v:5.1f}s" for k, v in timings.items())
    other = (t1 - t0) - sum(timings.values())
    print(
        f"pass {i}: total={t2-t0:6.1f}s  [{split}  plan-build={other:5.1f}s  "
        f"exec+write={t2-t1:5.1f}s]  rows={n}",
        flush=True,
    )
