"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import pytest
import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["category", "cnt"]


def test_queries_and_oracles_consistent():
    mod = _entry_mod()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(os_) <= set(qs)


@pytest.mark.slow
def test_all_queries_run_at_smoke_scale(spark, sf_dir):
    mod = _entry_mod()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
