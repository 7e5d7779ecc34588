"""Extra benchmarks / instrumentation for optimization work (r06).

``bench.py`` is the FROZEN driver contract; this file is the working
harness the optimization round uses to isolate queries per guide §1:

  python bench_extra.py q1 q2 ...      # time + job-count named queries
  python bench_extra.py --all          # every declared query
  python bench_extra.py --plans q1 ... # also dump explain("formatted")
                                       # to plans/r06/<q>_<tag>.txt
  --tag before|after                   # plan filename suffix
  --repeats N                          # interleaved passes (median)

Methodology mirrors bench.py exactly (same session factory, same
noop sink, same construction-inclusive timer, same warm-up) so numbers
are comparable; jobs are counted via a per-query job group.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--flagship", action="store_true")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod
    from turboxsl_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS)
    bench._warm_session(spark)
    if hasattr(entrymod, "_planted_embeddings"):
        entrymod._planted_embeddings(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    qs = entrymod.queries()
    names = list(qs) if args.all else args.queries
    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    sc = spark.sparkContext
    samples: dict[str, list[float]] = {}
    jobs: dict[str, int] = {}
    for rep in range(max(1, args.repeats)):
        for name in names:
            fn = qs[name]
            group = f"{name}-r{rep}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(name)
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(time.monotonic() - t0)
            jobs[name] = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("idle", "idle")
            if args.plans and rep == 0:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
    out = {}
    for name, ts in samples.items():
        out[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "spread": round(max(ts) - min(ts), 3),
            "jobs": jobs[name],
        }
    if args.flagship:
        data_path = bench.ensure_bench_transcripts(bench._sf_name())
        bench.run_flagship(spark, data_path)
        e1, rows = bench.run_flagship(spark, data_path)
        e2, _ = bench.run_flagship(spark, data_path)
        out["flagship_feature_build"] = {
            "median": round(min(e1, e2), 3),
            "rows": rows,
            "turns_per_sec": round(rows / min(e1, e2), 1),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
