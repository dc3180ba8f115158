"""The correctness gate, locally: every registered query vs its DuckDB
oracle at sf0.01 — same comparison shape the driver runs
(row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from fairy_spark.queries import ORACLE, QUERIES
from fairy_spark.testing.oracle import run_compare


@pytest.mark.parity
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, sf_dir, duck):
    res = run_compare(name, spark, sf_dir, duck)
    assert res.ok, str(res)
    if name in ORACLE:
        assert res.oracle_rows == res.spark_rows
        # The driver HASHES values: a cell that matches only within
        # float tolerance here is a driver mismatch there. Queries must
        # round/flatten on both sides until comparison is exact (sum
        # integer cents instead of doubles for large money totals).
        assert res.inexact_cells == 0, f"{res.inexact_cells} tolerance-only cells"


def test_all_queries_have_oracle_or_are_whitelisted():
    # Non-SQL-expressible ops get a rows-only check; keep that list tiny
    # and intentional.
    no_oracle = set(QUERIES) - set(ORACLE)
    allowed = {n for n in no_oracle if n.startswith(("stream_", "ml_", "mm_"))}
    assert no_oracle == allowed, f"queries missing oracle: {no_oracle - allowed}"
