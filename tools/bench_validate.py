"""Validate bench.py's medians against fully-isolated re-times.

The r7 bench harness restarts the SparkContext every N queries so that
per-query medians no longer drift with session age (VERDICT r5 item 2 /
r6 item 2). The acceptance check: a sample of recorded medians must sit
within measurement spread of the same queries re-timed in FULLY ISOLATED
fresh processes (one python subprocess per query — new JVM, new
SparkContext, nothing shared).

Usage: python tools/bench_validate.py [query ...]
  (default sample: the queries r6 flagged as phantom 'regressions' plus
   one cheap and one mid-cost anchor)

Reads bench_diag.json (written by the last `python bench.py` run) for
the recorded medians/spreads; writes bench_validate.json with the
comparison. A query passes when |bench_median - isolated_median| <=
max(bench_spread, isolated_spread, 0.30s floor for scheduling jitter).
Run it ALONE, like bench itself — concurrent Spark work contaminates
medians (~+20% measured).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SAMPLE = [
    "tpch_q1_pricing_summary",
    "w6_rolling_median",
    "sim_ivf_recall_eval",
    "emb_kmeans_step",
    "er_fuzzy_blocked",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
name, sf_dir, iters = {name!r}, {sf_dir!r}, {iters}
from delfos_etl_pipeline_spark import get_spark
from delfos_etl_pipeline_spark.queries import queries
from delfos_etl_pipeline_spark.sources.parquet import load_table
spark = get_spark(
    "bench-validate", master="local[" + {cpus!r} + "]",
    shuffle_partitions=int({cpus!r}),
    extra_conf={{"spark.ui.enabled": "false",
                 "spark.ui.showConsoleProgress": "false",
                 "spark.driver.memory": "16g"}},
)
spark.sparkContext.setLogLevel("ERROR")
fn = queries()[name]
load_table(spark, sf_dir, "lineitem").count()
# 3 warmups: a fresh process has COLD C2 JIT, while bench.py's chunks
# reuse one JVM — one warmup leaves the isolated runs biased ~20% high
# (measured), which is JIT state, not session aging.
for _ in range(3):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
times = []
for _ in range(iters):
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
times.sort()
print("RESULT " + json.dumps(
    {{"median": round(times[len(times) // 2], 2),
      "spread": round(times[-1] - times[0], 2)}}))
"""


def main() -> int:
    names = sys.argv[1:] or DEFAULT_SAMPLE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    iters = int(os.environ.get("SPARK_GRAFT_TIMED_ITERS", "5"))
    diag_path = os.path.join(REPO, "bench_diag.json")
    with open(diag_path) as f:
        diag = json.load(f)

    report, all_ok = [], True
    for name in names:
        if name not in diag["queries"]:
            print(f"SKIP {name}: not in bench_diag.json")
            continue
        child = _CHILD.format(
            repo=REPO, name=name, sf_dir=sf_dir, iters=iters, cpus=cpus
        )
        out = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True, text=True, timeout=900, cwd=REPO,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")
        ]
        if not line:
            print(f"FAIL {name}: isolated run produced no result\n{out.stderr[-500:]}")
            all_ok = False
            continue
        iso = json.loads(line[-1][len("RESULT "):])
        bench_med = diag["queries"][name]
        bench_spread = diag.get("spread", {}).get(name, 0.0)
        delta = round(abs(bench_med - iso["median"]), 2)
        # tolerance: the larger measured spread, a 0.30s scheduling-
        # jitter floor, or 15% relative (cross-process JIT/GC state is
        # never bit-identical; what matters is that recorded medians
        # aren't drifting by the ~0.5-0.6s session-aging deltas r6
        # mistook for regressions).
        tol = round(
            max(bench_spread, iso["spread"], 0.30, 0.15 * bench_med), 2
        )
        ok = delta <= tol
        all_ok &= ok
        report.append(
            {
                "query": name,
                "bench_median": bench_med,
                "bench_spread": bench_spread,
                "isolated_median": iso["median"],
                "isolated_spread": iso["spread"],
                "delta": delta,
                "tolerance": tol,
                "ok": ok,
            }
        )
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: bench={bench_med}s "
            f"isolated={iso['median']}s delta={delta}s tol={tol}s"
        )
    with open(os.path.join(REPO, "bench_validate.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "results": report}, f, indent=1)
    print("OK" if all_ok else "NOT OK")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
