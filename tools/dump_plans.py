"""Dump .explain("formatted") for named queries to plans/<round>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query ...>
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLANS_ROUND (default r16).

Plan capture only — no timed execution; safe to run while other work is
in flight (plans are timing-independent). State-building accessors
(persisted indexes) still run their one-time builds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(outdir, exist_ok=True)

    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.queries import queries

    spark = get_spark(
        "delfos-plan-dump",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        try:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as e:  # record the failure, keep going
            plan = f"ERROR capturing plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
