"""Diagnose which flagship sub-pipeline fails to scale 8→32 cores."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".bench_data", "transcripts_sf0.1.parquet")
MULT = 4


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from turboxsl_spark.functions.strings import avt_template, md5_hex, normalize_space
    from turboxsl_spark.operators.sessionize import with_session_id
    from turboxsl_spark.operators.windows import (
        conv_window,
        with_forward_fill,
        with_lag_lead,
        with_position,
        with_running,
    )
    from turboxsl_spark.session import get_spark

    spark = get_spark(f"diag-{cores}", cores=cores)

    def load():
        df = spark.read.parquet(DATA)
        copies = [
            df.withColumn("conv_id", F.concat(F.col("conv_id"), F.lit(f"#{i}")))
            for i in range(MULT)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timeit(name, build, reps=2):
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            noop(build())
            times.append(round(time.monotonic() - t0, 2))
        print(json.dumps({"cores": cores, "stage": name, "times": times}), flush=True)

    def textstage():
        df = load()
        df = df.withColumn("text_norm", normalize_space("text"))
        df = df.withColumn("text_len", F.length("text_norm"))
        df = df.withColumn("digest", md5_hex("conv_id", "turn_idx", "text_norm"))
        return df

    def windowstage():
        df = load()
        w = conv_window()
        df = with_position(df, w)
        df = with_lag_lead(df, ("role",), (1, 2), w)
        return df

    def fullwindow():
        df = load()
        w = conv_window()
        df = with_position(df, w)
        df = with_lag_lead(df, ("role",), (1, 2), w)
        df = with_session_id(df, 1800, w)
        df = with_forward_fill(df, ("tool",), w)
        df = with_running(df, {"turns_so_far": F.count(F.lit(1))}, w)
        return df

    timeit("scan_union", load)
    timeit("scan+text", textstage)
    timeit("scan+window", windowstage)
    timeit("scan+fullwindow", fullwindow)


def main():
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
        return
    for cores in (8, 32):
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, __file__, str(cores)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
        if out.returncode != 0:
            print(out.stderr[-2000:])


if __name__ == "__main__":
    main()
