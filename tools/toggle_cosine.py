"""Within-ONE-session A/B probe for the round-15 cosine kernel.

Arms: "kernel" (similarity.cosine_batch = the Arrow batch kernel, the
round-15 change) vs "fold" (cosine_batch monkeypatched back to the
interpreted `cosine` fold — the pre-change physical strategy; both are
(Column, Column) -> Column, and query functions resolve cosine_batch at
plan-construction time, so the patch toggles the strategy per run).
Same protocol as tools/toggle_probe.py: one warmed session, arms
interleaved back-to-back per query, order alternated across reps,
per-query min — the ambient-load-immune within-session bracket.

Usage:
  SPARK_GRAFT_SF_DIR=... TOGGLE_RUNS=3 python tools/toggle_cosine.py q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from aces_nifi_processors_bundle_spark.pipeline import similarity as S
from aces_nifi_processors_bundle_spark.plans.registry import QUERIES
from aces_nifi_processors_bundle_spark.session import get_spark

DEFAULT_QUERIES = [
    "q_sim_topk",
    "q_ann_recall",
    "q_ann_recall_budget",
    "q_ann_recall_sampled",
    "q_ann_topk",
    "q_ivf_topk",
    "q_hard_negatives",
    "q_semantic_dedup",
    "q_semantic_decontaminate",
    "q_semantic_decontaminate_fixed",
    "q_embedding_near_dups",
    "q_cluster_embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("TOGGLE_RUNS", "3"))
    names = sys.argv[1:] or DEFAULT_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="aces-toggle-cosine")
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm_udf(v: pd.Series) -> pd.Series:
        return v * 1.0

    (
        spark.range(100_000)
        .select((F.col("id") * 1.0).alias("x"))
        .repartition(32)
        .select(_warm_udf(F.col("x")).alias("y"))
        .groupBy((F.col("y") % 7).cast("long"))
        .count()
        .write.format("noop").mode("overwrite").save()
    )
    small = spark.range(100).select(F.col("id").alias("k"))
    (
        spark.range(100_000)
        .select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
        .join(F.broadcast(small), "k")
        .groupBy("k")
        .agg(F.slice(F.array_sort(F.collect_list(F.struct("v"))), 1, 5).alias("t"))
        .write.format("noop").mode("overwrite").save()
    )

    kernel_impl = S.cosine_batch  # the committed round-15 strategy
    fold_impl = S.cosine          # the pre-change interpreted fold
    times: dict[str, dict[str, list[float]]] = {
        n: {"kernel": [], "fold": []} for n in names
    }
    try:
        for r in range(runs):
            for name in names:
                arms = [("kernel", kernel_impl), ("fold", fold_impl)]
                if r % 2 == 1:
                    arms.reverse()  # cancel order bias across reps
                for label, impl in arms:
                    S.cosine_batch = impl
                    spark.sparkContext.setJobDescription(
                        f"toggle-cos:{name}:{label}"
                    )
                    t0 = time.perf_counter()
                    df = QUERIES[name](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    times[name][label].append(
                        round(time.perf_counter() - t0, 3)
                    )
                    spark.catalog.clearCache()
    finally:
        S.cosine_batch = kernel_impl
    out = {
        "tag": "toggle_cosine_kernel",
        "sf_dir": sf_dir,
        "runs": runs,
        "queries": {
            n: {k: min(v) for k, v in d.items()} for n, d in times.items()
        },
        "all": times,
    }
    line = json.dumps(out)
    print(line)
    os.makedirs(os.path.join(_REPO, "bench_logs"), exist_ok=True)
    with open(os.path.join(_REPO, "bench_logs", "probes.jsonl"), "a") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
