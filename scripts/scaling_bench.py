"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, evidenced in-sandbox at two
local[n] parallelism levels on identical input).

Runs bench.py as subprocesses at local[8] and local[32] with the same
fixed page count, computes efficiency = (thr_32 / thr_8) / 4, and writes
BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_pages] [mode]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_pages: int, mode: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_PAGES=str(n_pages),
        BENCH_MODE=mode,
        SPARK_GRAFT_SF_DIR=env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
    lo = run_bench(8, n_pages, mode)
    hi = run_bench(32, n_pages, mode)
    thr_lo = lo["docs_per_sec"]
    thr_hi = hi["docs_per_sec"]
    eff = (thr_hi / thr_lo) / 4.0
    result = {
        "mode": mode, "n_pages": n_pages,
        "local8": {"secs": lo["value"], "docs_per_sec": thr_lo},
        "local32": {"secs": hi["value"], "docs_per_sec": thr_hi},
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            f"""# BENCH — scaling evidence (N vs 4N parallelism)

North rule requires >= 0.8 throughput scaling efficiency from N to 4N
executors. Sandbox evidence: the same extraction job ({mode} path) on
the same {n_pages}-page deterministic input (seed 42) at two
parallelism levels, single host (no real cluster available here):

| config | wall sec | docs/sec |
|---|---|---|
| local[8]  (N)  | {lo['value']} | {thr_lo} |
| local[32] (4N) | {hi['value']} | {thr_hi} |

**Scaling efficiency (8 -> 32): {eff:.3f}**  (throughput ratio / 4)

Why this transfers to a real cluster: the fused path is map-only (zero
shuffle, no cross-partition dependency), so executor scaling is limited
only by input split count and scheduler overhead; on 1000 executors the
same plan shape applies per-partition. The relational path has exactly
one url-hash exchange whose width scales with the cluster.

Reference baseline: ~0.2-0.5 docs/s per replica (2-5 s/image,
/root/reference/README.md:217); this engine's per-core throughput is
reported above (docs are synthetic HTML ~2-60 KB, not OCR images — the
comparison point is pipeline overhead, not model inference).
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
