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
max(isolated spreads, capped envelope, 0.30s scheduling-jitter floor,
15% relative).

Round-9 tolerance redesign (VERDICT r8 "what's wrong" 2 + ADVICE r8):
the bench's OWN spread is no longer a tolerance term — a tolerance that
grows with the harness's noise can never fail on exactly the queries it
mismeasures (r8: curate_pipeline_staged spread 7.12s > median 6.03s
passed a 2.2x inflation). Instead, bench_spread > 0.5 x bench_median is
its own FAILURE ("unreliable measurement"). The isolated run-to-run
envelope stays a tolerance term but is (a) re-measured with a THIRD
isolated run when the first two disagree by more than the jitter floor,
and (b) capped at 0.25 x bench_median so two divergent isolated runs
cannot launder an arbitrary bench median; passes where the envelope term
decided the outcome are flagged "envelope_dominated" in the report.

Round-10 hardening (ADVICE r9): when third-run arbitration fires, the
outlier isolated run is dropped from the DELTA comparison too (not just
the envelope) — a bench median that matches the noisy outlier no longer
passes against it; and a bimodal bench recording (max-min range > the
median itself, 1s floor) must pass the STRICT gate (within
tol-without-envelope of a core isolated median, no window-drift rescue)
or it fails as "bimodal bench measurement".

Window drift: the host runs +/-20% faster or slower between 35-minute
windows on identical code (measured across five full r9 bench runs), so
a bench median recorded in one window can honestly disagree with
isolated runs measured in another. A failing entry therefore triggers
ONE re-measure of the bench recipe itself (fresh session, 1 warmup + 3
iters) in the CURRENT window: if the re-measure agrees with the isolated
runs, the recorded number was window-stale and the entry passes with
both numbers reported ("window_drift": true); if the re-measure
reproduces the disagreement, the harness structurally inflates that
query and the entry FAILS (the r8 chunk-contamination class).
Run it ALONE, like bench itself — concurrent Spark work contaminates
medians (~+20% measured).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def engine_tree_hash(repo: str = REPO) -> str:
    """Content hash of every file whose change can move a benched number
    — the engine package, the bench harness, the driver entry, and this
    validator. Stamped into bench_validate.json when the record is
    written; tests/test_registry.py FAILS when the committed record's
    stamp doesn't match the working tree (VERDICT r14 item 1: the
    validated record shipped stale-by-one-commit three rounds running —
    the discipline "the record is produced by the shipped code" is now
    structural, not procedural). Tests/docs are deliberately excluded:
    they cannot change a timing. A content hash, not a git SHA, so the
    check needs no git state and an amend/rebase that doesn't touch the
    engine doesn't invalidate a valid record."""
    import hashlib

    h = hashlib.sha256()
    paths = [
        os.path.join(repo, "bench.py"),
        os.path.join(repo, "__spark_entry__.py"),
        os.path.join(repo, "tools", "bench_validate.py"),
    ]
    pkg = os.path.join(repo, "delfos_etl_pipeline_spark")
    for dirpath, dirs, names in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        paths.extend(
            os.path.join(dirpath, n) for n in names if n.endswith(".py")
        )
    for path in sorted(paths):
        h.update(os.path.relpath(path, repo).encode())
        h.update(b"\0")
        with open(path, "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


DEFAULT_SAMPLE = [
    "tpch_q1_pricing_summary",
    "w6_rolling_median",
    "sim_ivf_recall_eval",
    # variance rationale (SCALE.md round 15 "emb_kmeans_step's variance,
    # pinned"): 74% of this name's cost is single-threaded plan
    # CONSTRUCTION (two collect jobs + Catalyst on 64 decimal sum trees),
    # the component most sensitive to host window — expect its isolated
    # medians to track the md5 single-core anchor, and classify whole-
    # number drift as window before suspecting the stable ~1s execution
    "emb_kmeans_step",
    "er_fuzzy_blocked",
    # the r8 chunk-inflation victims + the r8 code regression — the
    # exact names this tool historically mismeasured or couldn't re-time
    "curate_pipeline_staged",
    "dedup_clusters",
    "sim_ivf_build",
    # the r9 residual-drift victims (VERDICT r9 item 1)
    "text_quality_classifier",
    "emb_standardize",
    # the r13 registrations/conversions (VERDICT r12 items 1, 4) + the
    # lifecycle chapters the day-4 state chains through
    "curate_nightly_ingest_day4",
    "emb_project_pca",
    "curate_nightly_ingest_day2",
    "curate_nightly_ingest_day3",
    # the two r13 in-window drifters the validator never adjudicated
    # (VERDICT r13 item 2: 1.5-1.6x window drift on untouched code)
    "dq_referential_orphans",
    "profile_spearman_corr",
    # the r14 registration that is actually timed (the two streamed
    # chapters are deliberately NOT benched — bench.py HEADLINE comment:
    # their probe plans are byte-identical to their batch twins')
    "sim_ivf_build_bigk",
    "sim_pq_adc_bigk",
    # VERDICT r14 item 1: the top of the expensive tail must always have
    # a validated row — the #1 headline cost (curate_nightly_ingest,
    # 11.95s in the r14 driver window vs 3.6-4.3s isolated) shipped with
    # no row to answer it, and the other isolate-tier state builders
    # were equally unadjudicable
    "curate_nightly_ingest",
    "sim_ivfpq_probe",
    "dedup_minhash_incremental_indexed",
    # the r15 registrations: the certified large-k maintenance chapters
    "sim_ivf_lifecycle_bigk",
    "sim_pq_lifecycle_bigk",
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
# 3 warmups by default: a fresh process has COLD C2 JIT, while bench.py's
# chunks reuse one JVM — one warmup leaves the isolated runs biased ~20%
# high (measured), which is JIT state, not session aging. A re-measure
# pass overrides this to the bench recipe (1 warmup, 3 iters).
for _ in range({warmups}):
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


def run_isolated(name: str, child: str) -> dict | None:
    """One fully-isolated re-time (fresh python subprocess -> fresh JVM).
    Returns {"median": s, "spread": s} or None on timeout/no-result."""
    import subprocess as sp

    try:
        out = sp.run(
            [sys.executable, "-c", child],
            capture_output=True, text=True, timeout=900, cwd=REPO,
        )
    except sp.TimeoutExpired:
        print(f"FAIL {name}: isolated run timed out (900s)")
        return None
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    if not line:
        print(
            f"FAIL {name}: isolated run produced no result\n"
            f"{out.stderr[-500:]}"
        )
        return None
    return json.loads(line[-1][len("RESULT "):])


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
            repo=REPO, name=name, sf_dir=sf_dir, iters=iters, cpus=cpus,
            warmups=3,
        )
        isos = []
        for _ in range(2):  # two runs -> run-to-run envelope
            r = run_isolated(name, child)
            if r is None:
                # record the failure and keep the rest of the report
                # (ADVICE r7: an uncaught hang aborted the whole run)
                break
            isos.append(r)
        if len(isos) < 2:
            all_ok = False
            report.append({"query": name, "ok": False, "error": "isolated run failed"})
            continue
        bench_med = diag["queries"][name]
        bench_spread = diag.get("spread", {}).get(name, 0.0)
        # An unreliable bench measurement is its own failure: when the
        # bench's own spread — since r9 the MEDIAN'S nearest-neighbor gap,
        # i.e. the stability of the reported number itself, not the
        # outlier-owned max-min range — exceeds half its median, the
        # recorded number is noise and must be re-measured, not tolerated
        # (VERDICT r8 — curate_pipeline_staged spread 7.12s > median
        # 6.03s passed under the old tol).
        if bench_spread > 0.5 * bench_med:
            all_ok = False
            report.append(
                {
                    "query": name,
                    "bench_median": bench_med,
                    "bench_spread": bench_spread,
                    "isolated_medians": [i["median"] for i in isos],
                    "ok": False,
                    "error": "unreliable bench measurement "
                    f"(spread {bench_spread}s > 0.5 x median {bench_med}s)",
                }
            )
            print(
                f"FAIL {name}: unreliable bench measurement — spread "
                f"{bench_spread}s > 0.5 x median {bench_med}s "
                f"(isolated={[i['median'] for i in isos]})"
            )
            continue
        jitter_floor = max(0.30, 0.15 * bench_med)
        envelope = round(abs(isos[0]["median"] - isos[1]["median"]), 2)
        core = list(isos)  # the isolated runs delta is judged against
        if envelope > jitter_floor:
            # Two divergent isolated runs: arbitrate with a third instead
            # of letting the disagreement widen the tolerance (ADVICE r8).
            extra = run_isolated(name, child)
            if extra is not None:
                isos.append(extra)
                # closest-pair CORE of the three runs, NOT max-min: the
                # two runs that agree are the repeatable truth; the
                # outlier is exactly the noise the third run exists to
                # discount — so it is dropped from BOTH the envelope and
                # the delta comparison (ADVICE r9: a bench median that
                # matched the outlier, e.g. isolated [1.0, 1.05, 3.0]
                # with bench 3.1, used to pass against all three).
                srt = sorted(isos, key=lambda i: i["median"])
                meds = [i["median"] for i in srt]
                if meds[1] - meds[0] <= meds[2] - meds[1]:
                    core = srt[:2]
                else:
                    core = srt[1:]
                envelope = round(core[1]["median"] - core[0]["median"], 2)
        envelope_capped = round(min(envelope, 0.25 * bench_med), 2)
        # compare against the NEAREST core isolated median: any
        # repeatable isolated process is an equally valid ground truth,
        # but an arbitration-identified outlier is not.
        delta = round(
            min(abs(bench_med - i["median"]) for i in core), 2
        )
        # tolerance: the core isolated within-process spreads, the CAPPED
        # isolated run-to-run envelope, a 0.30s scheduling-jitter floor,
        # or 15% relative. The bench's own spread is deliberately NOT a
        # term — see module docstring.
        tol_wo_envelope = round(
            max(*(i["spread"] for i in core), 0.30, 0.15 * bench_med), 2
        )
        tol = max(tol_wo_envelope, envelope_capped)
        # Bimodal bench recording (ADVICE r9): "spread" is the median's
        # nearest-neighbor gap, so a 3-sample like [3.5, 6.03, 10.6]
        # passes the unreliable-spread gate while no two samples agree.
        # When the outlier-owned max-min RANGE exceeds the median itself
        # (and a 1s absolute floor — N=3 sub-second queries routinely
        # carry one GC outlier), the recorded median only passes the
        # STRICT gate: within tol_wo_envelope of a core isolated median,
        # no envelope help and no window-drift rescue — anything else is
        # re-benched, not tolerated.
        bench_range = diag.get("range", {}).get(name, 0.0)
        range_unreliable = bench_range > max(bench_med, 1.0)
        if range_unreliable:
            ok = delta <= tol_wo_envelope
            all_ok &= ok
            report.append(
                {
                    "query": name,
                    "bench_median": bench_med,
                    "bench_spread": bench_spread,
                    "bench_range": bench_range,
                    "isolated_medians": [i["median"] for i in isos],
                    "isolated_spreads": [i["spread"] for i in isos],
                    "delta": delta,
                    "tolerance": tol_wo_envelope,
                    "range_unreliable": True,
                    "ok": ok,
                }
                | (
                    {}
                    if ok
                    else {
                        "error": "bimodal bench measurement (range "
                        f"{bench_range}s > max(median, 1s)) and median "
                        "outside strict isolated tolerance"
                    }
                )
            )
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: bimodal bench "
                f"samples (range {bench_range}s > max(median "
                f"{bench_med}s, 1s)) — strict gate delta={delta}s vs "
                f"tol={tol_wo_envelope}s, "
                f"isolated={[i['median'] for i in isos]}"
            )
            continue
        ok = delta <= tol
        remeasured = None
        if not ok:
            # The bench median disagrees with isolated truth measured NOW.
            # Two distinct causes, distinguished by RE-MEASURING the bench
            # recipe (fresh session, 1 warmup + 3 iters) in the current
            # host window: (a) the recorded median is STALE — the host ran
            # slower/faster during the bench than it does now (r9 measured
            # +/-20% drift between 35-minute windows on identical code) —
            # the re-measure lands near the isolated runs and the entry
            # passes with both numbers reported; (b) the harness
            # structurally inflates this query (the r8 chunk-contamination
            # class) — the re-measure reproduces the bench number away
            # from isolated truth and the entry FAILS.
            rm_child = _CHILD.format(
                repo=REPO, name=name, sf_dir=sf_dir, iters=3, cpus=cpus,
                warmups=1,
            )
            rm = run_isolated(name, rm_child)
            if rm is not None:
                remeasured = rm["median"]
                rm_delta = round(
                    min(abs(remeasured - i["median"]) for i in core), 2
                )
                if rm_delta <= tol:
                    ok = True
        all_ok &= ok
        report.append(
            {
                "query": name,
                "bench_median": bench_med,
                "bench_spread": bench_spread,
                "isolated_medians": [i["median"] for i in isos],
                "isolated_spreads": [i["spread"] for i in isos],
                "envelope": envelope,
                "envelope_capped": envelope_capped,
                "delta": delta,
                "tolerance": tol,
                # the two pass reasons are mutually exclusive (ADVICE r9):
                # envelope_dominated = passed the direct gate only via the
                # envelope term; window_drift = failed the direct gate and
                # was rescued by the re-measure.
                "envelope_dominated": bool(
                    ok and delta <= tol and delta > tol_wo_envelope
                ),
                "remeasured_median": remeasured,
                "window_drift": bool(ok and delta > tol),
                "ok": ok,
            }
        )
        flag = (
            " [envelope-dominated]"
            if ok and delta <= tol and delta > tol_wo_envelope
            else ""
        )
        if ok and delta > tol:
            flag = (
                f" [window-drift: re-measured {remeasured}s matches isolated]"
            )
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: bench={bench_med}s "
            f"isolated={[i['median'] for i in isos]} delta={delta}s "
            f"tol={tol}s (envelope={envelope}s){flag}"
        )
    with open(os.path.join(REPO, "bench_validate.json"), "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                # the record's provenance stamp — see engine_tree_hash
                "engine_tree_sha256": engine_tree_hash(),
                "results": report,
            },
            f,
            indent=1,
        )
    print("OK" if all_ok else "NOT OK")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
