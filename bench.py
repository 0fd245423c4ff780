#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "pipeline": {"turns": N, "turns_per_sec": X},
     "scaling": {"n_cpus": 8, "four_n_cpus": 32,
                 "turns_per_sec_n": X, "turns_per_sec_4n": Y,
                 "efficiency": Y/(4X)}}

The scaling block evidences the north-rule two-cluster-size criterion by
running the identical end-to-end pipeline (ingest → classify → stateful
fold → exactly-once sink) at two parallelism levels in fresh JVMs
(local[8] vs local[32]) on the same input.

Probe mode (internal): ``bench.py --probe <cpus> <sf>`` runs only the
e2e pipeline and prints its turns/sec (used by the scaling block).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_pipeline(spark, sf: float, tmp: str) -> dict:
    """End-to-end: generate transcript stream files → streaming engine
    (classify + session fold) → exactly-once sink. Returns rate stats."""
    from pyspark.sql import functions as F

    from distributed_classification_system_spark.sources.gen import (
        gen_conv_config,
        gen_label_registry,
        gen_transcripts,
        n_convs_for_sf,
    )
    from distributed_classification_system_spark.streaming import engine as eng

    n = n_convs_for_sf(sf)
    inp = os.path.join(tmp, "in")
    out = os.path.join(tmp, "out")
    t = gen_transcripts(spark, n)
    # write input via fast path: time-ordered files = plausible stream
    t.repartitionByRange(8, "ts").write.parquet(inp)
    n_turns = spark.read.parquet(inp).count()

    cfg = gen_conv_config(spark, n)
    reg = gen_label_registry(spark)
    t0 = time.time()
    eng.run_stream(
        spark, inp, out, cfg, reg,
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        await_termination=True,
    )
    elapsed = time.time() - t0
    sunk = eng.read_turn_results(spark, out).count()
    assert sunk == n_turns, f"sink rows {sunk} != input {n_turns}"
    return {"turns": n_turns, "sec": round(elapsed, 2),
            "turns_per_sec": round(n_turns / elapsed, 1)}


def probe(cpus: int, sf: float) -> None:
    from distributed_classification_system_spark.session import get_spark

    spark = get_spark(app_name=f"bench_probe_{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    tmp = tempfile.mkdtemp(prefix=f"bench_probe_{cpus}_")
    try:
        stats = run_pipeline(spark, sf, tmp)
        print("PROBE_RESULT " + json.dumps(stats))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def scaling_block(sf: float) -> dict:
    """Run the identical pipeline at N=8 and 4N=32 cores in fresh JVMs."""
    rates = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", str(cpus), str(sf)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("PROBE_RESULT ")]
        if not line:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
            raise RuntimeError(f"probe {cpus} failed")
        rates[cpus] = json.loads(line[-1].removeprefix("PROBE_RESULT "))
    eff = rates[32]["turns_per_sec"] / (4 * rates[8]["turns_per_sec"])
    return {
        "n_cpus": 8,
        "four_n_cpus": 32,
        "turns_per_sec_n": rates[8]["turns_per_sec"],
        "turns_per_sec_4n": rates[32]["turns_per_sec"],
        "sec_n": rates[8]["sec"],
        "sec_4n": rates[32]["sec"],
        "efficiency": round(eff, 3),
    }


HEADLINE = [
    "classify_docs_udf",
    "classify_docs_expr",
    "classify_summary",
    "pricing_summary",
    "fact_dim_revenue",
    "dim_join_rollup",
    "tumbling_window",
    "exact_percentiles",
    "asof_join",
    "user_sessions",
    "exact_dedup",
    "minhash_lsh",
    "ngram_jaccard",
    "ann_bruteforce",
    "ann_ivf",
    "lang_id",
    "quality_scores",
    "topk_per_group",
]


def main() -> None:
    from distributed_classification_system_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)
    qmap = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        # count() drives the full plan without collecting payloads
        qmap[name](spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        t0 = time.time()
        pipe = run_pipeline(spark, sf, tmp)
        times["e2e_pipeline"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    scaling = None if SKIP_SCALING else scaling_block(sf)

    out = {
        "metric": "classified turns/sec end-to-end (ingest->classify->sink)",
        "value": round(sum(times.values()), 2),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pipeline": pipe,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--probe":
        probe(int(sys.argv[2]), float(sys.argv[3]))
    else:
        main()
