"""Unit tests for the r7 growth surface beyond the oracle gate:
apply_cdc edge semantics (operators/merge.py) and the geo grid-join's
wraparound / Morton-encoding invariants (queries/geo.py) against
independent Python reimplementations."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.operators.merge import apply_cdc

SF_SMALL = "/root/testdata/sf0.001"


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_latest_seq_wins_and_delete(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "U", "a1", 11),
            (1, 2, "U", "a2", 12),  # supersedes seq 1
            (2, 1, "D", None, None),
            (4, 1, "I", "d", 40),
        ],
        "k long, seq long, op string, s string, v long",
    )
    out = _rows(apply_cdc(_snap(spark), log, key="k"))
    assert out == [(1, "a2", 12), (3, "c", 30), (4, "d", 40)]


def test_cdc_delete_then_reinsert_and_delete_of_absent_key(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "D", None, None),
            (1, 2, "I", "a9", 99),  # re-insert AFTER the delete: key lives
            (99, 1, "D", None, None),  # delete of an absent key: no phantom
        ],
        "k long, seq long, op string, s string, v long",
    )
    out = _rows(apply_cdc(_snap(spark), log, key="k"))
    assert out == [(1, "a9", 99), (2, "b", 20), (3, "c", 30)]


def test_cdc_update_of_absent_key_upserts_and_null_keys_dropped(spark):
    log = spark.createDataFrame(
        [
            (7, 1, "U", "new", 70),  # U on absent key behaves as insert
            (None, 1, "I", "ghost", 0),  # NULL key: dropped, never a phantom
        ],
        "k long, seq long, op string, s string, v long",
    )
    out = _rows(apply_cdc(_snap(spark), log, key="k"))
    assert out == [(1, "a", 10), (2, "b", 20), (3, "c", 30), (7, "new", 70)]


def test_cdc_empty_log_is_identity(spark):
    log = spark.createDataFrame([], "k long, seq long, op string, s string, v long")
    assert _rows(apply_cdc(_snap(spark), log, key="k")) == _rows(_snap(spark))


# --- geo invariants -------------------------------------------------------


def _brute_force_knn(sf_dir):
    """Independent NumPy-free reimplementation of geo_cell_knn's
    contract: nearest customer within the 3x3 cell neighborhood,
    longitude wrapped, ties by custkey."""
    import duckdb

    from fairy_spark.queries.geo import (
        _CUST_LAT_P,
        _CUST_LON_P,
        _LAT_SPAN,
        _LON_SPAN,
        _SUPP_LAT_P,
        _SUPP_LON_P,
        cell_side_for,
    )

    con = duckdb.connect()
    sup = con.sql(
        f"SELECT s_suppkey FROM read_parquet('{sf_dir}/supplier.parquet')"
    ).fetchall()
    cus = con.sql(
        f"SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    side = cell_side_for(len(cus))
    n_lon_cells = _LON_SPAN // side
    cells: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    for (ck,) in cus:
        la, lo = (ck * _CUST_LAT_P) % _LAT_SPAN, (ck * _CUST_LON_P) % _LON_SPAN
        cells.setdefault((la // side, lo // side), []).append((ck, la, lo))
    out = {}
    for (sk,) in sup:
        la, lo = (sk * _SUPP_LAT_P) % _LAT_SPAN, (sk * _SUPP_LON_P) % _LON_SPAN
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (
                    la // side + dx,
                    (lo // side + dy + n_lon_cells) % n_lon_cells,
                )
                for ck, cla, clo in cells.get(cell, []):
                    dlat = abs(la - cla)
                    dlon = min(abs(lo - clo), _LON_SPAN - abs(lo - clo))
                    cand = (dlat * dlat + dlon * dlon, ck)
                    if best is None or cand < best:
                        best = cand
        if best is not None:
            out[sk] = (best[1], best[0])
    return out


def test_geo_cell_knn_matches_brute_force(spark):
    from fairy_spark.queries import QUERIES

    got = {
        r["s_suppkey"]: (r["nn_custkey"], r["dist2_cd"])
        for r in QUERIES["geo_cell_knn"](spark, SF_SMALL).collect()
    }
    assert got == _brute_force_knn(SF_SMALL)


def test_geo_lon_wraparound_pairs_exist_at_sf001():
    """The wraparound branch is actually exercised: at least one
    nearest-neighbor distance at sf0.001 crosses the lon 0/35999 seam
    (dlon computed via the 36000 - |diff| arm)."""
    import duckdb

    from fairy_spark.queries.geo import (
        _CUST_LON_P,
        _LON_SPAN,
        _SUPP_LON_P,
    )

    con = duckdb.connect()
    sup = [
        k
        for (k,) in con.sql(
            f"SELECT s_suppkey FROM read_parquet('{SF_SMALL}/supplier.parquet')"
        ).fetchall()
    ]
    cus = [
        k
        for (k,) in con.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_SMALL}/customer.parquet')"
        ).fetchall()
    ]
    crossings = 0
    for sk in sup:
        lo_s = (sk * _SUPP_LON_P) % _LON_SPAN
        for ck in cus:
            lo_c = (ck * _CUST_LON_P) % _LON_SPAN
            if abs(lo_s - lo_c) > _LON_SPAN - abs(lo_s - lo_c):
                crossings += 1
    assert crossings > 0


def test_morton_interleave_roundtrip(spark):
    """The Spark Morton expression is a bijection over the full
    18 x 36 cell grid and deinterleaves back to (lat_c, lon_c)."""
    from fairy_spark.queries.geo import _morton_col

    grid = [(la, lo) for la in range(18) for lo in range(36)]
    df = spark.createDataFrame(grid, "lat_c long, lon_c long").withColumn(
        "m", _morton_col(F.col("lat_c"), F.col("lon_c"))
    )
    rows = df.collect()
    seen = set()
    for r in rows:
        m = r["m"]
        assert m not in seen
        seen.add(m)
        lat = sum(((m >> (2 * b + 1)) & 1) << b for b in range(5))
        lon = sum(((m >> (2 * b)) & 1) << b for b in range(6))
        assert (lat, lon) == (r["lat_c"], r["lon_c"])


def _brute_force_radius(sf_dir):
    """Independent reimplementation of geo_radius_join's contract:
    EVERY (supplier, customer) pair within R = cell_side // 4 — pure
    all-pairs Python, no cells, so it also proves the 3x3 blocking
    loses nothing (completeness: R <= cell_side)."""
    import duckdb

    from fairy_spark.queries.geo import (
        _CUST_LAT_P,
        _CUST_LON_P,
        _LAT_SPAN,
        _LON_SPAN,
        _SUPP_LAT_P,
        _SUPP_LON_P,
        cell_side_for,
    )

    con = duckdb.connect()
    sup = con.sql(
        f"SELECT s_suppkey FROM read_parquet('{sf_dir}/supplier.parquet')"
    ).fetchall()
    cus = con.sql(
        f"SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    r = cell_side_for(len(cus)) // 4
    out = set()
    for (sk,) in sup:
        slat, slon = (sk * _SUPP_LAT_P) % _LAT_SPAN, (sk * _SUPP_LON_P) % _LON_SPAN
        for (ck,) in cus:
            clat, clon = (ck * _CUST_LAT_P) % _LAT_SPAN, (ck * _CUST_LON_P) % _LON_SPAN
            dlat = abs(slat - clat)
            dlon = min(abs(slon - clon), _LON_SPAN - abs(slon - clon))
            d2 = dlat * dlat + dlon * dlon
            if d2 <= r * r:
                out.add((sk, ck, d2))
    return out


def test_geo_radius_join_matches_all_pairs_brute_force(spark):
    from fairy_spark.queries import QUERIES

    got = {
        (r["s_suppkey"], r["c_custkey"], r["dist2_cd"])
        for r in QUERIES["geo_radius_join"](spark, SF_SMALL).collect()
    }
    want = _brute_force_radius(SF_SMALL)
    assert got == want and got  # non-empty, complete AND precise
