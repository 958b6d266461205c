"""The house correctness gate: every registered query with an oracle must
match DuckDB on the smoke-scale data (the driver runs the same comparison
at sf=0.01; tools/check.py runs it standalone)."""

from __future__ import annotations

import duckdb
import pytest

from streamprocessing_spark.registry import all_specs
from streamprocessing_spark.sources.readers import TABLES
from tools.check import check_query

# Round 11: the full-registry sweep is the slow tier — the default
# fast tier must finish inside the driver's verify window (pytest.ini).
pytestmark = pytest.mark.slow

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    result = check_query(spark, duck, name, SPECS[name], sf_dir)
    assert result["ok"], result["detail"]
