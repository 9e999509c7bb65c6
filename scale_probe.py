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

SKEW MODE (``--skew`` / SCALE_PROBE_SKEW=1 → ``.scale/sf1-skew``): the
uniform replication above never stresses hot keys, so salted_join's
machinery and the sessionize/funnel user-key shuffles were previously
measured only under flat key distributions. Skew mode additionally
- remaps events.user_id to a ZIPF distribution (inverse-power
  transform of a uniform event-id hash, alpha=1.1: the hottest user
  takes ~53% of all events, the top-10 ~70% — rank r gets
  P(r) ∝ r^-alpha), keeping user cardinality unchanged so hot_keys =
  range(10) in q_salted_join matches the actually-hot ids;
- floods 5% of documents with one of three boilerplate templates —
  the minhash-band hot-bucket shape (exact-dup flood) real crawl
  corpora exhibit.

Usage:
    python scale_probe.py                 # generate .scale/sf1 if absent
    python scale_probe.py --skew          # generate .scale/sf1-skew
    python scale_probe.py --salt-compare  # time salted vs unsalted vs
                                          # AQE-skew join on the skew set
    SPARK_GRAFT_SF_DIR=.scale/sf1 python bench.py          # full bench
    SPARK_GRAFT_SF_DIR=.scale/sf1-skew \
      SPARK_GRAFT_ONLY=q_salted_join,q_sessionize,q_funnel,q_dedup_minhash \
      python bench.py                                      # skew subset
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from aces_nifi_processors_bundle_spark.session import get_spark
from aces_nifi_processors_bundle_spark.sources.registry import load_table

SKEW = (
    "--skew" in sys.argv
    or "--salt-compare" in sys.argv  # the comparison only means anything on skew
    or os.environ.get("SCALE_PROBE_SKEW") == "1"
)
SRC = os.environ.get("SCALE_PROBE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SCALE_PROBE_OUT",
    os.path.join(
        os.path.dirname(__file__), ".scale", "sf1-skew" if SKEW else "sf1"
    ),
)
REPLICAS = 10
STRIDE = 100_000_000
ZIPF_ALPHA = 1.1
N_USERS = 1500  # sf0.1 user cardinality; replicas share the user space
DOC_TEMPLATES = [
    "click here to accept all cookies and continue to the requested page",
    "copyright all rights reserved terms of service privacy policy contact",
    "loading please wait while we redirect you to the destination site",
]


def _zipf_users(df):
    """Deterministic zipf remap of user_id: u = uniform(0,1) from an
    event-id hash; rank = floor(u^(-1/alpha)) clamped to the original
    user cardinality — P(rank) ~ rank^-alpha, hottest rank first. The
    remap preserves per-event everything else, so sessionize/funnel
    semantics are unchanged — only the key distribution moves."""
    u = (
        F.pmod(F.xxhash64(F.col("event_id")), F.lit(1_000_000)).cast("double")
        + 0.5
    ) / 1_000_000.0
    rank = F.least(
        F.floor(F.pow(1.0 / u, F.lit(1.0 / ZIPF_ALPHA))), F.lit(float(N_USERS))
    ).cast("long")
    return df.withColumn("user_id", rank - 1)


def _template_flood(df, i):
    """5% of docs (deterministic by doc_id) become one of three exact
    boilerplate templates — the minhash/simhash hot-bucket shape. The
    templates do NOT get the per-replica suffix (the flood must be
    identical ACROSS replicas to concentrate one band bucket); the
    remaining 95% keep the sf1 near-dup suffix structure."""
    sel = F.col("doc_id") % 20 == 0
    tpl = F.array(*[F.lit(t) for t in DOC_TEMPLATES])[
        (F.col("doc_id") % 3).cast("int")
    ]
    rest = (
        F.concat(F.col("text"), F.lit(f" probe{i}")) if i else F.col("text")
    )
    return df.withColumn("text", F.when(sel, tpl).otherwise(rest))

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


def salt_compare() -> None:
    """Time the q_salted_join shape three ways on the skew dataset:
    (a) explicit salted_join (the shipped operator), (b) plain join
    with AQE skew-join handling left ON (what a user gets for free),
    (c) plain join with AQE skew-join OFF (the unmitigated baseline).
    Broadcast is disabled for all three — the dim side here is small
    enough to broadcast at this SF, which would sidestep the skew
    entirely and measure nothing (at 100 TB the dim wouldn't fit).
    Prints one JSON line for SCALE.md."""
    import json
    import time

    from aces_nifi_processors_bundle_spark.operators.joins import salted_join

    spark = get_spark(app_name="aces-salt-compare")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    events = load_table(spark, OUT, "events").select("event_id", "user_id")
    dim = load_table(spark, OUT, "events").groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("u_first_us")
    )
    variants = {
        "salted": lambda: salted_join(
            events, dim, on="user_id", hot_keys=list(range(10)), n_salts=8
        ),
        "plain_aqe_skew_on": lambda: events.join(dim, "user_id"),
        "plain_aqe_skew_off": lambda: events.join(dim, "user_id"),
    }
    out: dict[str, float] = {}
    for name, build in variants.items():
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "false" if name.endswith("off") else "true",
        )
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"salt_compare": out, "dir": OUT}))
    spark.stop()


def main() -> None:
    if SKEW:
        TABLES["events"] = (["event_id"], lambda df, i: _zipf_users(df))
        TABLES["documents"] = (["doc_id"], _template_flood)
    # SCALE_PROBE_TABLES=events,documents restricts generation (e.g. an
    # events-only sf10 skew set for the salt-compare crossover probe).
    only = os.environ.get("SCALE_PROBE_TABLES")
    if only:
        keep = {t.strip() for t in only.split(",")}
        for t in [t for t in TABLES if t not in keep]:
            del TABLES[t]
        PASSTHROUGH[:] = [t for t in PASSTHROUGH if t in keep]
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
    if "--salt-compare" in sys.argv:
        salt_compare()
    else:
        main()
