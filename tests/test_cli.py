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
