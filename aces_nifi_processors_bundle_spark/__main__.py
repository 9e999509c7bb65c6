"""CLI: run, list, and explain the engine's registered queries.

The reference is operated through the NiFi canvas; the Spark engine's
equivalent operational surface is this module plus bench.py:

    python -m aces_nifi_processors_bundle_spark list
    python -m aces_nifi_processors_bundle_spark run q_bin_flagship \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m aces_nifi_processors_bundle_spark explain q_dedup_minhash
    python -m aces_nifi_processors_bundle_spark oracle q_bin_flagship
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _session(get_spark, app_name):
    """Only stop the session on exit if the CLI created it — an
    embedding process (tests, a notebook) keeps its own session.

    getActiveSession is THREAD-LOCAL: an embedder that built its
    session on another thread would look absent here and the CLI
    would stop a shared session. Check the process-wide default
    session too (private but stable; it is exactly the state
    builder.getOrCreate() consults)."""
    from pyspark.sql import SparkSession

    pre = (
        SparkSession.getActiveSession()
        or getattr(SparkSession, "_instantiatedSession", None)
    )
    return get_spark(app_name=app_name), pre is None


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aces_nifi_processors_bundle_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain", "oracle"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        if name != "oracle":
            sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
        if name == "explain":
            sp.add_argument("--mode", default="formatted")
    fp = sub.add_parser("flow", help="run a JSON flow definition file")
    fp.add_argument("flow_file")
    fp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    fp.add_argument("--limit", type=int, default=20)
    st = sub.add_parser(
        "store", help="keyed-store operations (time travel / history)"
    )
    st.add_argument("action", choices=["history", "read", "restore", "diff"])
    st.add_argument("path")
    st.add_argument("--keys", required=True, help="comma-separated key columns")
    st.add_argument("--n-buckets", type=int, default=64)
    st.add_argument("--version", type=int, default=None)
    st.add_argument("--to-version", type=int, default=None,
                    help="diff: newer version (default latest)")
    st.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if args.cmd == "store":
        from .session import get_spark
        from .stores import KeyedParquetStore

        spark, owned = _session(get_spark, "aces-cli-store")
        try:
            store = KeyedParquetStore(
                spark=spark, path=args.path,
                keys=[k.strip() for k in args.keys.split(",")],
                n_buckets=args.n_buckets,
            )
            if args.action == "history":
                for h in store.history():
                    print(f"v{h['version']}\t{h['op']}\t{h['ts']}")
            elif args.action == "read":
                store.read(args.version).show(args.limit, truncate=False)
            elif args.action == "diff":
                if args.version is None:
                    print("diff requires --version (the older side)",
                          file=sys.stderr)
                    return 2
                store.diff(args.version, args.to_version).show(
                    args.limit, truncate=False
                )
            else:
                if args.version is None:
                    print("restore requires --version", file=sys.stderr)
                    return 2
                store.restore(args.version)
                print(f"restored to v{args.version} "
                      f"(published v{store.history()[0]['version']})")
        finally:
            if owned:
                spark.stop()
        return 0

    if args.cmd == "flow":
        import json

        from .flows import build_flow
        from .session import get_spark

        with open(args.flow_file) as fh:
            flow = json.load(fh)
        spark, owned = _session(get_spark, "aces-cli-flow")
        try:
            build_flow(spark, flow, args.sf_dir).show(args.limit, truncate=False)
        finally:
            if owned:
                spark.stop()
        return 0

    from .plans.oracles import ORACLES
    from .plans.registry import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if args.cmd == "oracle":
        if args.query not in ORACLES:
            print(f"no oracle for {args.query!r}", file=sys.stderr)
            return 2
        print(ORACLES[args.query].strip())
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2

    from .session import get_spark

    spark, owned = _session(get_spark, f"aces-cli-{args.cmd}")
    try:
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "run":
            df.show(args.limit, truncate=False)
        else:
            jvm = spark._jvm
            em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(args.mode)
            print(df._jdf.queryExecution().explainString(em))
    finally:
        if owned:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
