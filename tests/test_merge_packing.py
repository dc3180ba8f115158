"""Unit tests for operators/merge.py and operators/packing.py edge
semantics the oracle queries can't isolate: source-NULL-wins on merge,
and prefix-sum correctness across shard boundaries / empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from fairy_spark.operators.merge import merge_upsert
from fairy_spark.operators.packing import pack_into_bins, packed_running_sum


def test_merge_matched_source_null_wins(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2")], "k INT, v STRING"
    )
    source = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=3, v="new3")], "k INT, v STRING"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(target, source, "k").collect()}
    # matched key 1 takes the source row WHOLESALE — including its NULL
    assert got == {1: None, 2: "old2", 3: "new3"}


def test_merge_requires_matching_columns(spark):
    a = spark.createDataFrame([Row(k=1, v="x")], "k INT, v STRING")
    b = spark.createDataFrame([Row(k=1, w="y")], "k INT, w STRING")
    # ValueError, not assert: asserts vanish under python -O, and this
    # is an API contract, not a debugging aid.
    with pytest.raises(ValueError, match="column sets"):
        merge_upsert(a, b, "k")


def test_merge_drops_null_keys_and_dedupes_source(spark):
    """NULL source keys never equi-join (they'd emit all-NULL garbage
    rows) and duplicate source keys would fan matched target rows out
    through the full-outer join — both are filtered on entry."""
    t = spark.createDataFrame([Row(k=1, v="old"), Row(k=2, v="keep")], "k INT, v STRING")
    s = spark.createDataFrame(
        [Row(k=1, v="new"), Row(k=1, v="new"), Row(k=None, v="junk")],
        "k INT, v STRING",
    )
    out = {r["k"]: r["v"] for r in merge_upsert(t, s, "k").collect()}
    assert out == {1: "new", 2: "keep"}  # no fan-out, no NULL-key row


def test_merge_duplicate_source_keys_pick_deterministic_winner(spark):
    """Duplicate source keys collapse to the GREATEST row under the
    name-sorted non-key tuple — a total order, so the winner cannot
    depend on partition/plan order (the round-3 version took an
    arbitrary dropDuplicates row)."""
    t = spark.createDataFrame([Row(k=1, a="z", b=0)], "k INT, a STRING, b INT")
    # ordering key is struct(a, b): ("x", 99) > ("w", 5) > (None, 7)
    s = spark.createDataFrame(
        [Row(k=1, a="w", b=5), Row(k=1, a="x", b=99), Row(k=1, a=None, b=7),
         Row(k=2, a="m", b=1), Row(k=2, a="m", b=2)],
        "k INT, a STRING, b INT",
    )
    out = {r["k"]: (r["a"], r["b"]) for r in merge_upsert(t, s, "k").collect()}
    assert out == {1: ("x", 99), 2: ("m", 2)}
    # and the choice is stable under a different input order
    out2 = {
        r["k"]: (r["a"], r["b"])
        for r in merge_upsert(t, s.orderBy(F.desc("b")).repartition(7), "k").collect()
    }
    assert out2 == out


def test_prefix_sum_matches_serial_fold_across_shards(spark):
    rows = [Row(id=i, w=(i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, w BIGINT")
    # many shards so several shard boundaries land inside the range
    out = {
        r["id"]: r["cum"]
        for r in packed_running_sum(df, "id", "w", n_shards=16).collect()
    }
    acc = 0
    for r in rows:
        acc += r.w
        assert out[r.id] == acc, (r.id, out[r.id], acc)


def test_prefix_sum_sparse_ids_and_empty(spark):
    sparse = spark.createDataFrame(
        [Row(id=3, w=2), Row(id=1000, w=5), Row(id=40, w=1)], "id BIGINT, w BIGINT"
    )
    got = {
        r["id"]: r["cum"]
        for r in packed_running_sum(sparse, "id", "w", n_shards=8).collect()
    }
    assert got == {3: 2, 40: 3, 1000: 8}
    empty = spark.createDataFrame([], "id BIGINT, w BIGINT")
    assert packed_running_sum(empty, "id", "w").count() == 0


def test_pack_bins_never_splits_monotonically(spark):
    rows = [Row(id=i, tok=50) for i in range(40)]
    df = spark.createDataFrame(rows, "id BIGINT, tok BIGINT")
    out = (
        pack_into_bins(df, "id", "tok", bin_tokens=512, n_shards=4)
        .orderBy("id")
        .collect()
    )
    bins = [r["bin_id"] for r in out]
    # bins are nondecreasing in id order and change at ~512-token marks
    assert bins == sorted(bins)
    assert bins[0] == 0 and bins[-1] == (50 * 39) // 512


def test_sharded_rank_matches_serial_sort(spark):
    """sharded_global_row_number == the serial sorted position, across
    shard boundaries, duplicate leading keys, negatives, and a shard
    count larger than the row count."""
    from fairy_spark.operators.ranking import sharded_global_row_number

    vals = [(-50.0, 1), (-50.0, 2), (0.0, 3), (0.25, 4), (0.25, 5),
            (7.5, 6), (7.5, 7), (7.5, 8), (1000.0, 9), (1000.0, 10)]
    df = spark.createDataFrame(vals, "v DOUBLE, id INT")
    for shards in (1, 3, 64):
        out, n = sharded_global_row_number(df, ["v", "id"], n_shards=shards)
        assert n == len(vals)
        got = {r["id"]: r["pos"] for r in out.collect()}
        want = {id_: i + 1 for i, (_, id_) in enumerate(sorted(vals))}
        assert got == want, (shards, got)


def test_sharded_rank_single_distinct_key_and_empty(spark):
    from fairy_spark.operators.ranking import sharded_global_row_number

    same = spark.createDataFrame([(5.0, i) for i in range(20)], "v DOUBLE, id INT")
    out, n = sharded_global_row_number(same, ["v", "id"], n_shards=8)
    assert n == 20
    assert [r["pos"] for r in out.orderBy("id").collect()] == list(range(1, 21))
    empty = spark.createDataFrame([], "v DOUBLE, id INT")
    out_e, n_e = sharded_global_row_number(empty, ["v", "id"], n_shards=8)
    assert n_e == 0 and out_e.count() == 0


def test_sharded_ntile_split_matches_sql_ntile(spark):
    """The driver-side NTILE reconstruction used by
    text_curriculum_decile (q, r = divmod(N, k); first r buckets wide)
    must equal SQL NTILE for totals that do NOT divide evenly — both
    oracle SFs have N % 10 == 0, so this branch never fires there."""
    from pyspark.sql import Window

    for n, k in [(23, 10), (7, 10), (40, 7), (10, 10)]:
        df = spark.createDataFrame([(float(i), i) for i in range(n)], "v DOUBLE, id INT")
        from fairy_spark.operators.ranking import sharded_global_row_number

        ranked, total = sharded_global_row_number(df, ["v", "id"], n_shards=4)
        from fairy_spark.operators.ranking import ntile_from_pos

        mine = {
            row["id"]: row["b"]
            for row in ranked.select(
                "id", ntile_from_pos(F.col("pos"), total, k).cast("int").alias("b")
            ).collect()
        }
        w = Window.orderBy("v", "id")  # tiny n: global window is fine in a test
        want = {
            row["id"]: row["b"]
            for row in df.select("id", F.ntile(k).over(w).alias("b")).collect()
        }
        assert mine == want, (n, k, mine, want)


def test_merge_map_typed_column_excluded_from_ordering(spark):
    """ADVICE r4: a map-typed non-key column must not break the winner
    agg at analysis time — it is excluded from the ordering struct but
    still rides along with the winning row (picked by the orderable
    columns)."""
    t = spark.createDataFrame(
        [Row(k=1, v=0, m={"old": 1})], "k INT, v INT, m MAP<STRING, INT>"
    )
    s = spark.createDataFrame(
        [Row(k=1, v=5, m={"lo": 5}), Row(k=1, v=9, m={"hi": 9})],
        "k INT, v INT, m MAP<STRING, INT>",
    )
    out = {r["k"]: (r["v"], dict(r["m"])) for r in merge_upsert(t, s, "k").collect()}
    # winner is the greatest ORDERABLE tuple (v=9) and its own map
    assert out == {1: (9, {"hi": 9})}


def test_merge_all_nonkey_columns_unorderable_falls_back(spark):
    """With NO orderable non-key column there is no ordering key;
    the collapse degrades to dropDuplicates instead of failing."""
    t = spark.createDataFrame([Row(k=1, m={"old": 0})], "k INT, m MAP<STRING, INT>")
    s = spark.createDataFrame(
        [Row(k=1, m={"a": 1}), Row(k=1, m={"a": 1}), Row(k=2, m={"b": 2})],
        "k INT, m MAP<STRING, INT>",
    )
    out = {r["k"]: dict(r["m"]) for r in merge_upsert(t, s, "k").collect()}
    assert set(out) == {1, 2} and out[2] == {"b": 2} and out[1] == {"a": 1}
