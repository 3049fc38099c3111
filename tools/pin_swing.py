"""Same-epoch A/B attribution for a bench swing (VERDICT r10 task #6).

The r10 sf3 sweep timed ``ngram_jaccard_neardup`` at 36.6 s vs r9's
27.2 s with the operator's code untouched (`git diff` empty for
dedup.py) — either the known ±25% JVM-epoch swing PLANS.md documents,
or a real regression hiding in session/config drift. The two sweeps
ran in different epochs, so they cannot distinguish the two.

This tool CAN: it times the same registry query from two checkouts
(e.g. the r9 tag in a git worktree vs the current tree) in the SAME
epoch, interleaved A/B/A/B..., each trial in a fresh subprocess with
its own JVM so neither code version warms the other. If the r10-era
gap reproduces same-direction across interleaved trials, the cause is
in the diff; if both checkouts land on the same number, the sweep gap
was epoch noise — counter-evidence on the record.

Usage:
    python tools/pin_swing.py QUERY SF_DIR ROOT_A ROOT_B [TRIALS] [--json OUT]

Each trial prints min-of-REPS (default 3, SPARK_GRAFT_BENCH_REPS) for
one checkout; the verdict compares per-checkout medians-of-mins.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

# Runs inside the subprocess: land in the checkout's own registry,
# time the query the way bench.py does (noop sink, min of REPS, GC
# barrier before the reps), print one float.
_TRIAL = r"""
import os, sys, time
root = sys.argv[1]; query = sys.argv[2]; sf_dir = sys.argv[3]
sys.path.insert(0, root)
from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark
import __spark_entry__ as se
spark = get_spark("pin-swing")
spark.sparkContext.setLogLevel("ERROR")
for t in ("documents",):
    spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
qs = se.queries()
df = qs[query](spark, sf_dir)
spark.sparkContext._jvm.System.gc()
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(f"PIN_RESULT {best:.3f}")
"""


def _one_trial(root: str, query: str, sf_dir: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _TRIAL, root, query, sf_dir],
        capture_output=True, text=True, cwd=root)
    for line in out.stdout.splitlines():
        if line.startswith("PIN_RESULT "):
            return float(line.split()[1])
    raise RuntimeError(
        f"trial in {root} produced no result:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out_path]
    query, sf_dir, root_a, root_b = args[:4]
    trials = int(args[4]) if len(args) > 4 else 4

    results: dict[str, list[float]] = {root_a: [], root_b: []}
    for i in range(trials):
        for root in (root_a, root_b):  # interleaved: same epoch for both
            t = _one_trial(root, query, sf_dir)
            results[root].append(t)
            print(f"[trial {i}] {os.path.basename(root) or root}: {t:.3f} s",
                  flush=True)

    med = {r: statistics.median(v) for r, v in results.items()}
    ratio = med[root_b] / med[root_a] if med[root_a] else float("inf")
    verdict = ("SAME-EPOCH GAP REPRODUCES — cause is in the diff"
               if ratio > 1.15 or ratio < 1 / 1.15
               else "no same-epoch gap — prior sweep delta was epoch noise")
    summary = {
        "query": query, "sf_dir": sf_dir, "trials": trials,
        "load_1min": round(os.getloadavg()[0], 2),
        "results": {r: [round(x, 3) for x in v] for r, v in results.items()},
        "medians": {r: round(m, 3) for r, m in med.items()},
        "ratio_b_over_a": round(ratio, 3),
        "verdict": verdict,
    }
    print(json.dumps(summary, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
