"""End-to-end parity of every queries() entry against its DuckDB oracle —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_matches_oracle


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, ddb, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver's
    else:
        assert_matches_oracle(df, ddb, sql)


def test_reap_scratch_pid_liveness(tmp_path):
    """Per-PID scratch reaping is exact: dead-pid trees go however
    fresh they are (the r8 OOM loop was minutes-old crash debris a pure
    age gate protected), live-pid and fresh legacy trees stay."""
    import os

    from orange3_spark.session import _reap_stale_scratch

    (tmp_path / "999999").mkdir()            # no such pid
    (tmp_path / str(os.getpid())).mkdir()    # this process: alive
    (tmp_path / "spark-legacy").mkdir()      # legacy layout, fresh
    _reap_stale_scratch(str(tmp_path))
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == sorted([str(os.getpid()), "spark-legacy"])
