"""DuckDB oracle comparison harness (SURVEY.md §5.2).

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL over the same parquet, then compare row count, schema
(column name set), and values order-insensitively — columns sorted by
name, rows canonically sorted, floats with tolerance.

We additionally count cells that are not *exactly* equal after
canonicalization ("hash risk") — the driver hashes values, so any
tolerance-only match here is a potential driver mismatch to fix by
rounding inside the query on both sides.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from fairy_spark.sources.tables import TABLE_NAMES, table_path

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-12


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        if os.path.isdir(p):
            # Spark-written tables are DIRECTORIES of part files
            # (sf1_bench replicas); testdata ships single files —
            # DuckDB needs the glob form for the former.
            p = p.rstrip("/") + "/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)
    inexact_cells: int = 0  # matched only via tolerance — driver-hash risk

    def __str__(self) -> str:
        s = "OK" if self.ok else "FAIL"
        extra = f" inexact_cells={self.inexact_cells}" if self.inexact_cells else ""
        probs = ("\n  " + "\n  ".join(self.problems)) if self.problems else ""
        return f"[{s}] {self.name} rows={self.spark_rows}/{self.oracle_rows}{extra}{probs}"


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-columns, canonically-typed frame."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # normalize to tz-naive micros
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            out[c] = s.map(_canon_cell)
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    return out


def _canon_cell(v):
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    return v


def _sort_key_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Stable row ordering: stringify every cell (floats at limited
    precision so both engines order ties identically)."""
    def keyify(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, tuple):
            return "[" + ",".join(keyify(x) for x in v) + "]"
        return repr(v)

    return df.map(keyify)


def _cells_equal(a, b) -> tuple[bool, bool]:
    """(equal, exact). Tolerance only for floats.

    int-vs-float pairs are NEVER exact even when numerically equal:
    the driver's value hash is dtype-sensitive, so a DuckDB HUGEINT
    column materialized as float64 against a Spark int64 column
    hash-mismatches despite equal values (r8 graph_hits /
    ts_rolling_median postmortem — VERDICT r8 item 3). Treating such
    pairs as exact was the hole that let that class through two full
    audits; now they increment the inexact_cells hash-risk counter.
    """
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False, False
        both_float = isinstance(a, float) and isinstance(b, float)
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True, both_float
        if fa == fb:
            return True, both_float
        ok = math.isclose(fa, fb, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL)
        return ok, False
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False, False
        exact = True
        for x, y in zip(a, b):
            eq, ex = _cells_equal(x, y)
            if not eq:
                return False, False
            exact = exact and ex
        return True, exact
    eq = a == b
    try:
        eq = bool(eq)
    except Exception:
        eq = False
    return eq, eq


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name=name, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(duck_pdf))

    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        res.ok = False
        res.problems.append(f"schema mismatch: spark={s_cols} oracle={d_cols}")
        return res
    if len(spark_pdf) != len(duck_pdf):
        res.ok = False
        res.problems.append("row count mismatch")
        return res

    s = _canon_frame(spark_pdf)
    d = _canon_frame(duck_pdf)

    # Column-dtype parity: an int column on one side vs a float column
    # on the other is a guaranteed driver hash mismatch even with equal
    # values (DuckDB HUGEINT -> pandas float64 vs Spark int64). Flag it
    # as a hard problem so no audit can pass with the divergence.
    for c in s.columns:
        s_int = pd.api.types.is_integer_dtype(s[c])
        d_int = pd.api.types.is_integer_dtype(d[c])
        s_flt = pd.api.types.is_float_dtype(s[c])
        d_flt = pd.api.types.is_float_dtype(d[c])
        if (s_int and d_flt) or (s_flt and d_int):
            res.ok = False
            res.problems.append(
                f"dtype mismatch col={c}: spark={s[c].dtype} oracle={d[c].dtype}"
                " (int vs float — driver hash would fail)"
            )
    if not res.ok:
        return res
    s_idx = _sort_key_frame(s).sort_values(by=list(s.columns), kind="mergesort").index
    d_idx = _sort_key_frame(d).sort_values(by=list(d.columns), kind="mergesort").index
    s = s.loc[s_idx].reset_index(drop=True)
    d = d.loc[d_idx].reset_index(drop=True)

    bad = 0
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            a = None if (a is pd.NaT or (isinstance(a, float) and False)) else a
            if a is pd.NaT:
                a = None
            if b is pd.NaT:
                b = None
            if isinstance(a, pd.Timestamp):
                a = a.to_pydatetime()
            if isinstance(b, pd.Timestamp):
                b = b.to_pydatetime()
            eq, exact = _cells_equal(_canon_cell(a), _canon_cell(b))
            if not eq:
                bad += 1
                if len(res.problems) < 5:
                    res.problems.append(f"value mismatch col={c} row={i}: spark={a!r} oracle={b!r}")
            elif not exact:
                res.inexact_cells += 1
    if bad:
        res.ok = False
        res.problems.append(f"{bad} mismatched cells total")
    return res


def run_compare(name: str, spark, sf_dir: str, con: duckdb.DuckDBPyConnection) -> CompareResult:
    from fairy_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLE:
        return CompareResult(name=name, ok=len(spark_pdf) >= 0, spark_rows=len(spark_pdf), oracle_rows=-1)
    duck_pdf = con.execute(ORACLE[name]).fetchdf()
    return compare_frames(name, spark_pdf, duck_pdf)
