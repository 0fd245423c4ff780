#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4): per-query
isolation with the noop sink and min-of-N repetition, plus
explain("formatted") capture. bench.py stays frozen; this file only
produces evidence for OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py time  [query ...]   # min-of-N noop-sink timing
    python bench_extra.py plan  [query ...]   # write plans/r06/<q>_<tag>.txt
    python bench_extra.py pipe                # e2e pipeline phase breakdown

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPS (default 3),
BENCH_EXTRA_TAG (plan file suffix, default 'before').
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")

DEFAULT_QUERIES = [
    "classify_docs_udf", "classify_docs_expr", "classify_summary",
    "classify_docs_1k", "conv_fold_docs", "minhash_lsh", "ngram_jaccard",
    "chunk_shared_pairs", "simhash_near_dups", "exact_dedup",
    "stratified_sample", "pack_sequences", "pack_greedy", "chunk_documents",
    "sliding_window", "tumbling_window", "exact_percentiles",
    "pricing_summary", "fact_dim_revenue", "ann_bruteforce", "ann_ivf",
    "lang_id", "token_stats", "quality_scores", "topk_per_group",
    "asof_join", "user_sessions", "hourly_series", "interp_align",
    "near_dup_clusters",
]


def _spark():
    from distributed_classification_system_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    # same warmup as bench.py so worker spawn is not charged to a query
    from pyspark.sql import functions as F

    from distributed_classification_system_spark.functions.kernel import classify_udf

    spark.range(2000).select(
        classify_udf(
            F.concat(F.lit("dog cat x"), F.col("id").cast("string")),
            F.array(F.lit("dog"), F.lit("cat")),
            F.lit(3),
            F.lit(0.2),
        )
    ).count()
    return spark


def time_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qmap = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(REPS):
            load = os.getloadavg()[0]
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples,
                     "loadavg_last": round(load, 2)}
        print(f"{name}: min={min(samples)} {samples}", flush=True)
    print("EXTRA_RESULT " + json.dumps(out), flush=True)


def plans(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qmap = entrymod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = f"plans/r06/{name}_{TAG}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)


def pipe() -> None:
    """e2e pipeline phase breakdown: gen, stream run, per-batch durations."""
    import bench as benchmod

    spark = _spark()
    sf = benchmod._sf_from_dir(SF_DIR)
    tmp = tempfile.mkdtemp(prefix="bench_extra_e2e_")
    try:
        t0 = time.time()
        benchmod.prepare_input(spark, sf, tmp)
        t_gen = time.time() - t0
        t0 = time.time()
        stats = benchmod.run_pipeline(spark, sf, tmp, data_dir=tmp)
        t_run = time.time() - t0
        print(json.dumps({
            "gen_sec": round(t_gen, 2),
            "run_pipeline_sec": round(t_run, 2),
            "pipeline": {k: stats[k] for k in ("turns", "sec", "turns_per_sec",
                                               "best_batch_rate")},
            "batches": stats["batches"],
        }, indent=1), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if mode == "time":
        time_queries(names)
    elif mode == "plan":
        plans(names)
    elif mode == "pipe":
        pipe()
    else:
        raise SystemExit(f"unknown mode {mode}")
