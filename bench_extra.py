"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench: bench.py stays the frozen measurement contract.
This tool isolates single queries with the noop sink, repeats them, and
dumps .explain("formatted") plans for plans/r06/.

Usage:
  python bench_extra.py time  <query> [query ...]   # min/median of N reps
  python bench_extra.py plan  <suffix> <query> ...  # plans/r06/<q>_<suffix>.txt
  python bench_extra.py all                         # time every BENCH query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _spark():
    from ocr_poc_spark.session import get_spark

    return get_spark(
        "bench_extra", cpus=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(512 * 1024)},
    )


def _fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def cmd_time(names: list[str]) -> None:
    spark = _spark()
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(REPS):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name:28s} min={min(samples):7.3f}  samples={samples}", flush=True)
    print(json.dumps(out))


def cmd_plan(suffix: str, names: list[str]) -> None:
    spark = _spark()
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(_fmt_plan(qs[name](spark, SF_DIR)))
        print(f"wrote {path}")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3:])
    elif cmd == "all":
        import bench as bench_mod

        cmd_time(list(bench_mod.BENCH_QUERIES))
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
