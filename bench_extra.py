#!/usr/bin/env python3
"""Extra measurement harness for the optimization rounds (bench.py is
frozen for driver measurement — this file holds everything else).

Subcommands:
  plans <outdir> [query ...]   dump .explain("formatted") per query
  time <query> [reps]          noop-sink timing of one query (guide §1.4)
  timeall [reps]               noop-sink timing of the headline list
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_spans_rich", "extract_spans_rich_lite", "extract_spans_oracle",
    "chunk_islands_sql", "dedup_exact", "dedup_minhash_lsh", "simhash16",
    "token_count", "quality_score", "knn_brute", "broadcast_dim_join",
    "window_rownum_dedup", "extract_spans_paged_oracle",
    "extract_spans_paged_tail", "tfidf_top_terms", "pack_bins",
    "dedup_cluster", "pii_scrub", "extract_spans_realfile",
    "mm_jpeg_dct_chain",
]


def make_spark(app: str):
    # same session shape as bench.py so plans/timings are comparable
    from pyspark.sql import SparkSession

    from pdf2dom_spark import memtune
    os.environ.update({k: v for k, v in memtune.tuned_env().items()
                       if k.startswith("MALLOC_")})
    memtune.tune_malloc()
    s = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def dump_plans(outdir: str, names: list[str]) -> None:
    import __spark_entry__ as e

    os.makedirs(outdir, exist_ok=True)
    spark = make_spark("plans")
    qs = e.queries()
    for name in names or HEADLINE:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # pragma: no cover
            txt = f"explain failed: {ex}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        sys.stderr.write(f"  dumped {name}\n")
    spark.stop()


def time_queries(names: list[str], reps: int = 2) -> None:
    import json

    import __spark_entry__ as e

    spark = make_spark("time")
    qs = e.queries()
    # warm JVM + python workers
    try:
        warm = ("/root/testdata/sf0.001"
                if os.path.isdir("/root/testdata/sf0.001") else SF_DIR)
        qs["extract_spans_rich"](spark, warm).count()
    except Exception as ex:
        sys.stderr.write(f"warmup failed: {ex}\n")
    out = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            out[name] = min(dt, out.get(name, float("inf")))
            sys.stderr.write(f"  {name}: {round(dt, 3)}s\n")
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))
    spark.stop()


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "timeall"
    if cmd == "plans":
        dump_plans(sys.argv[2], sys.argv[3:])
    elif cmd == "time":
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        time_queries([sys.argv[2]], reps)
    else:
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        time_queries(HEADLINE, reps)


if __name__ == "__main__":
    main()
