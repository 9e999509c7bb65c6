"""Scale probe: derive an sf1-sized dataset (10x sf0.1) and bench on it.

The driver ships fixtures up to sf0.1 only; the probe answers the
question the small-SF bench can't — do the per-query costs scale with
rows (good) or worse (a hidden n² / skew / small-files problem)?

Derivation (deterministic, from the driver's own sf0.1 parquet):
10 replicas per table with key columns shifted by a replica stride, and
payloads perturbed so similarity structure stays realistic instead of
producing 10 exact copies of everything:
- documents.text gets a per-replica suffix token — replicas become
  near-duplicates of their original (a near-dup-rich corpus stresses
  the minhash/simhash banding far harder than iid text);
- embeddings are rotated by the replica index — different directions,
  same norm/component distribution (exact copies would make every
  LSH bucket quadratic in replica count at cos=1.0).

Usage:
    python scale_probe.py                # generate .scale/sf1 if absent
    SPARK_GRAFT_SF_DIR=.scale/sf1 python bench.py   # bench against it
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aces_nifi_processors_bundle_spark.session import get_spark
from aces_nifi_processors_bundle_spark.sources.registry import load_table

SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALE_PROBE_OUT", os.path.join(os.path.dirname(__file__), ".scale", "sf1"))
REPLICAS = 10
STRIDE = 100_000_000

# table -> (key columns to shift, per-replica payload perturbation)
TABLES = {
    "events": (["event_id"], None),
    "orders": (["o_orderkey"], None),
    # lineitem replicates with l_orderkey shifted by the SAME stride as
    # orders, so order->lineitem join integrity holds per replica;
    # l_suppkey stays unshifted (suppliers pass through unreplicated).
    "lineitem": (["l_orderkey"], None),
    "customer": (["c_custkey"], None),
    "documents": (
        ["doc_id"],
        lambda df, i: df.withColumn(
            "text", F.concat(F.col("text"), F.lit(f" probe{i}")) if i else F.col("text")
        ),
    ),
    "embeddings": (
        ["vec_id"],
        # rotate the vector by i positions: new direction, same dist
        lambda df, i: df.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), i + 1, 64 - i),
                F.slice(F.col("embedding"), 1, i),
            )
            if i
            else F.col("embedding"),
        ),
    ),
}


# Dimension tables too small to replicate: copied through verbatim so
# every registry query (incl. the TPC-H-shaped OLAP ones) runs at sf1.
PASSTHROUGH = ["supplier", "nation", "region", "part"]


def main() -> None:
    spark = get_spark(app_name="aces-scale-probe")
    for name in PASSTHROUGH:
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst):
            print(f"{name}: exists, skipping")
            continue
        load_table(spark, SRC, name).write.mode("overwrite").parquet(dst)
        print(f"{name}: copied through")
    for name, (keys, perturb) in TABLES.items():
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst):
            print(f"{name}: exists, skipping")
            continue
        df = load_table(spark, SRC, name)
        out = None
        for i in range(REPLICAS):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if perturb is not None:
                rep = perturb(rep, i)
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(dst)
        print(f"{name}: wrote {REPLICAS}x replicas")
    spark.stop()


if __name__ == "__main__":
    main()
