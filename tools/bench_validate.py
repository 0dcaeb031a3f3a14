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
comparison. Each query is re-timed in TWO independent isolated
processes; their disagreement |iso1 - iso2| is the measured per-query
run-to-run ENVELOPE — the empirical floor under which bench-vs-isolated
deltas are indistinguishable from process-level noise (VERDICT r7
item 5: a fixed tolerance failed its own run on window-heavy plans
whose JIT/GC state varies ~0.5-0.7s across fresh processes). A query
passes when |bench_median - nearest isolated median| <=
max(spreads, envelope, 0.30s scheduling-jitter floor, 15% relative).
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
        isos, failed = [], False
        for attempt in range(2):  # two runs -> run-to-run envelope
            try:
                out = subprocess.run(
                    [sys.executable, "-c", child],
                    capture_output=True, text=True, timeout=900, cwd=REPO,
                )
            except subprocess.TimeoutExpired:
                # record the failure and keep the rest of the report
                # (ADVICE r7: an uncaught hang aborted the whole run)
                print(f"FAIL {name}: isolated run {attempt} timed out (900s)")
                failed = True
                break
            line = [
                ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")
            ]
            if not line:
                print(
                    f"FAIL {name}: isolated run {attempt} produced no "
                    f"result\n{out.stderr[-500:]}"
                )
                failed = True
                break
            isos.append(json.loads(line[-1][len("RESULT "):]))
        if failed:
            all_ok = False
            report.append({"query": name, "ok": False, "error": "isolated run failed"})
            continue
        bench_med = diag["queries"][name]
        bench_spread = diag.get("spread", {}).get(name, 0.0)
        envelope = round(abs(isos[0]["median"] - isos[1]["median"]), 2)
        # compare against the NEAREST isolated median: either isolated
        # process is an equally valid ground truth.
        delta = round(
            min(abs(bench_med - i["median"]) for i in isos), 2
        )
        # tolerance: the larger measured spread, the measured isolated
        # run-to-run envelope, a 0.30s scheduling-jitter floor, or 15%
        # relative. The envelope term is what makes "ok" meaningful:
        # the bench median only fails when it sits FURTHER from both
        # isolated runs than those runs sit from each other.
        tol = round(
            max(
                bench_spread,
                *(i["spread"] for i in isos),
                envelope,
                0.30,
                0.15 * bench_med,
            ),
            2,
        )
        ok = delta <= tol
        all_ok &= ok
        report.append(
            {
                "query": name,
                "bench_median": bench_med,
                "bench_spread": bench_spread,
                "isolated_medians": [i["median"] for i in isos],
                "isolated_spreads": [i["spread"] for i in isos],
                "envelope": envelope,
                "delta": delta,
                "tolerance": tol,
                "ok": ok,
            }
        )
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: bench={bench_med}s "
            f"isolated={[i['median'] for i in isos]} delta={delta}s "
            f"tol={tol}s (envelope={envelope}s)"
        )
    with open(os.path.join(REPO, "bench_validate.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "results": report}, f, indent=1)
    print("OK" if all_ok else "NOT OK")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
