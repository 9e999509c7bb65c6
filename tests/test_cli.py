"""CLI surface: the subcommands that don't need a SparkSession run
instantly and are safe to unit-test in-process."""

from __future__ import annotations

from aces_nifi_processors_bundle_spark.__main__ import main


def test_cli_list_names_every_registered_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from aces_nifi_processors_bundle_spark.plans.registry import QUERIES

    listed = {ln.split("\t")[0] for ln in out.strip().splitlines()}
    assert listed == set(QUERIES)
    assert "q_bin_flagship\toracle" in out


def test_cli_oracle_prints_sql_and_rejects_unknown(capsys):
    assert main(["oracle", "q_bin_flagship"]) == 0
    assert "SELECT" in capsys.readouterr().out
    assert main(["oracle", "q_nope"]) == 2


def test_cli_unknown_query_is_actionable(capsys):
    assert main(["run", "q_nope"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_store_history_read_restore(spark, tmp_path, capsys):
    """The store subcommand surfaces time travel operationally."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.__main__ import main
    from aces_nifi_processors_bundle_spark.operators.partial_update import (
        PartialUpdateConfig,
    )
    from aces_nifi_processors_bundle_spark.stores import KeyedParquetStore

    path = str(tmp_path / "t")
    store = KeyedParquetStore(spark=spark, path=path, keys=["k"], n_buckets=4)
    store.init(spark.createDataFrame([Row(k=1, v=1.0)]))
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    store.merge(spark.createDataFrame([Row(k=1, v=2.0)]), cfg)

    assert main(["store", "history", path, "--keys", "k"]) == 0
    out = capsys.readouterr().out
    assert "v2\tmerge" in out and "v1\tinit" in out

    assert main(["store", "read", path, "--keys", "k", "--version", "1"]) == 0
    assert "1.0" in capsys.readouterr().out

    assert main(["store", "restore", path, "--keys", "k", "--version", "1",
                 "--n-buckets", "4"]) == 0
    assert "restored to v1" in capsys.readouterr().out
    assert store.read().collect()[0]["v"] == 1.0


def test_cli_store_diff(spark, tmp_path, capsys):
    from aces_nifi_processors_bundle_spark.__main__ import main
    from aces_nifi_processors_bundle_spark.stores import KeyedParquetStore

    path = str(tmp_path / "clidiff")
    store = KeyedParquetStore(spark=spark, path=path, keys=["k"], n_buckets=4)
    store.init(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    store.init(spark.createDataFrame([(1, "a"), (3, "c")], "k long, v string"))
    assert main(["store", "diff", path, "--keys", "k", "--version", "1"]) == 0
    out = capsys.readouterr().out
    assert "insert" in out and "delete" in out
    # missing --version is a usage error, not a crash
    assert main(["store", "diff", path, "--keys", "k"]) == 2
