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
Round-12 ADVICE fixes: argparse (the hand-rolled filter corrupted
positionals when --json's value collided with one, and a trailing
--json crashed), and the warm-up is one UNTIMED execution of the
query itself — warming exactly the fixtures and code paths the timed
reps touch, the way bench.py's calibration discipline does, instead
of a documents-only table scan that left other fixtures cold in the
first rep.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

# Runs inside the subprocess: land in the checkout's own registry,
# time the query the way bench.py does (noop sink, min of REPS, GC
# barrier before the reps), print one float. With PIN_EXPR=1 the
# "query" is instead a Python SCRIPT (the bench-entry construction
# for entries that live only in bench.py, e.g. skew_sum_salted) run
# with ``spark``/``sf_dir`` in scope; it must bind ``df``.
_TRIAL = r"""
import os, sys, time
root = sys.argv[1]; query = sys.argv[2]; sf_dir = sys.argv[3]
sys.path.insert(0, root)
from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark
spark = get_spark("pin-swing")
spark.sparkContext.setLogLevel("ERROR")
reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
if os.environ.get("PIN_EXPR") == "1":
    def _mk():
        env = {"spark": spark, "sf_dir": sf_dir}
        exec(query, env)
        return env["df"]
else:
    import __spark_entry__ as se
    qs = se.queries()
    def _mk():
        return qs[query](spark, sf_dir)
# one untimed execution warms the exact fixtures + code paths the
# timed reps will touch (not just the documents table). Eager-at-
# plan-time entries get a fresh frame per rep (the bench's
# timed_build discipline); pure-lazy plans reuse one frame, so the
# warm run is honest either way.
_mk().write.format("noop").mode("overwrite").save()
spark.sparkContext._jvm.System.gc()
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    _mk().write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(f"PIN_RESULT {best:.3f}")
"""


def _one_trial(root: str, query: str, sf_dir: str,
               expr: bool = False) -> float:
    env = dict(os.environ, PIN_EXPR="1" if expr else "0")
    out = subprocess.run(
        [sys.executable, "-c", _TRIAL, root, query, sf_dir],
        capture_output=True, text=True, cwd=root, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("PIN_RESULT "):
            return float(line.split()[1])
    raise RuntimeError(
        f"trial in {root} produced no result:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}")


def main() -> None:
    p = argparse.ArgumentParser(
        description="Same-epoch interleaved A/B timing of one registry "
                    "query across two checkouts")
    p.add_argument("query")
    p.add_argument("sf_dir")
    p.add_argument("root_a")
    p.add_argument("root_b")
    p.add_argument("trials", nargs="?", type=int, default=4)
    p.add_argument("--json", dest="out_path", default=None,
                   metavar="OUT", help="also write the summary JSON here")
    p.add_argument("--expr", action="store_true",
                   help="QUERY is a Python script binding `df` (for "
                        "bench-only entries with no registry name); "
                        "pass a path to a .py file or the script text")
    a = p.parse_args()
    if a.expr and os.path.isfile(a.query):
        with open(a.query) as f:
            a.query = f.read()

    results: dict[str, list[float]] = {a.root_a: [], a.root_b: []}
    for i in range(a.trials):
        for root in (a.root_a, a.root_b):  # interleaved: same epoch
            t = _one_trial(root, a.query, a.sf_dir, expr=a.expr)
            results[root].append(t)
            print(f"[trial {i}] {os.path.basename(root) or root}: {t:.3f} s",
                  flush=True)

    med = {r: statistics.median(v) for r, v in results.items()}
    ratio = med[a.root_b] / med[a.root_a] if med[a.root_a] else float("inf")
    verdict = ("SAME-EPOCH GAP REPRODUCES — cause is in the diff"
               if ratio > 1.15 or ratio < 1 / 1.15
               else "no same-epoch gap — prior sweep delta was epoch noise")
    summary = {
        "query": a.query, "sf_dir": a.sf_dir, "trials": a.trials,
        "load_1min": round(os.getloadavg()[0], 2),
        "results": {r: [round(x, 3) for x in v] for r, v in results.items()},
        "medians": {r: round(m, 3) for r, m in med.items()},
        "ratio_b_over_a": round(ratio, 3),
        "verdict": verdict,
    }
    print(json.dumps(summary, indent=1))
    if a.out_path:
        with open(a.out_path, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
