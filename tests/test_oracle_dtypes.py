"""Registry-wide oracle output-dtype sweep (VERDICT r8 item 2).

The r8 postmortem: two oracles (`graph_hits`, `ts_rolling_median`)
emitted un-cast SUM(BIGINT)-derived columns — DuckDB types them
HUGEINT and `fetchdf()` materializes HUGEINT as float64, while the
Spark side returns int64. Equal values, different dtype: the local
tolerant compare passed, the driver's dtype-sensitive value hash
failed. Two layers now keep that class dead:

1. `_cells_equal` / `compare_frames` (fairy_spark/testing/oracle.py)
   treat int-vs-float as inexact/dtype-problem, so every full audit
   catches an instance at value-compare time.
2. THIS sweep: `DESCRIBE (<oracle sql>)` binds every registered
   oracle (no execution) and asserts no output column is HUGEINT —
   the only DuckDB type in our surface whose pandas materialization
   silently changes numeric kind. Runs in seconds, so it's a standing
   gate rather than a per-round audit artifact.
"""

from __future__ import annotations

import pytest

from fairy_spark.queries import ORACLE
from fairy_spark.testing.oracle import duck_connect

SF_SMALL = "/root/testdata/sf0.001"


def test_no_oracle_emits_hugeint_columns():
    con = duck_connect(SF_SMALL)
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(ORACLE.items()):
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        bad = [(col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns typed HUGEINT (pandas materializes these as "
        f"float64 -> driver hash mismatch; add CAST(... AS BIGINT)): {offenders}"
    )


def test_int_float_cells_are_never_exact():
    """The hole itself: equal int-vs-float cell pairs must count as
    hash-risk (inexact), never exact."""
    from fairy_spark.testing.oracle import _cells_equal

    eq, exact = _cells_equal(3, 3.0)
    assert eq and not exact
    eq, exact = _cells_equal(3.0, 3)
    assert eq and not exact
    eq, exact = _cells_equal(3.0, 3.0)
    assert eq and exact
    eq, exact = _cells_equal(3, 3)
    assert eq and exact
    # nested in array cells too
    eq, exact = _cells_equal((1, 2.0), (1, 2))
    assert eq and not exact


def test_compare_frames_flags_int_vs_float_column():
    """An int64 Spark column vs float64 oracle column with equal values
    must FAIL (the driver would), not pass with a tolerance match."""
    import pandas as pd

    from fairy_spark.testing.oracle import compare_frames

    s = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1, 2], dtype="int64")})
    d = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1.0, 2.0], dtype="float64")})
    res = compare_frames("dtype_probe", s, d)
    assert not res.ok
    assert any("dtype mismatch" in p for p in res.problems)


@pytest.mark.parametrize("name", ["graph_hits", "ts_rolling_median"])
def test_r8_regressions_bind_as_bigint(name):
    """The two r8 offenders specifically: their score/x/med7 columns
    must DESCRIBE as BIGINT after the CAST fixes."""
    con = duck_connect(SF_SMALL)
    desc = con.execute(f"DESCRIBE ({ORACLE[name]})").fetchall()
    for col, typ, *_ in desc:
        assert "HUGEINT" not in typ.upper(), f"{name}.{col} is {typ}"
