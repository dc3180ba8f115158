"""MERGE / upsert — the row-level maintenance op the reference's KV
overwrite path implies at table granularity (put = overwrite semantics,
local_file_kv_store.rs:19-48), expressed relationally.

Spark core has no built-in MERGE INTO against plain parquet (that's a
table-format feature), but the semantics compose from one full-outer
join: source wins on key conflicts (WHEN MATCHED UPDATE), source-only
keys append (WHEN NOT MATCHED INSERT), untouched target rows pass
through. One shuffle on the key for each side; with both tables
bucketed on the key (the KV layout) the join is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _orderable(dt: T.DataType) -> bool:
    """Can Catalyst sort this type? Maps (and anything containing one)
    have no ordering, so they can't participate in the max_by key."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``key``: matched keys take
    the source row wholesale, unmatched source keys are inserted,
    remaining target rows are unchanged. Columns must match.

    The merged frame is returned (caller persists/writes it — at scale
    you'd write partitioned and swap, like KVStore.compact).

    Source keys must be unique and non-null — a duplicate source key
    would fan matched target rows out through the full-outer join
    (silent row multiplication) and a NULL key never equi-joins, so the
    precondition is enforced here: NULL-key source rows are dropped and
    duplicate source keys collapse to ONE deterministic winner — the
    greatest row under the name-sorted ORDERABLE non-key column tuple
    (max_by over a struct), the same total-order idiom put_df uses on
    ingest. Unorderable-typed columns (maps, nested maps) are excluded
    from the ordering key but still ride along in the winning row; if
    NO non-key column is orderable the collapse degrades to
    dropDuplicates (arbitrary but stable-per-run winner) rather than
    failing at analysis time (ADVICE r4). Plan-order nondeterminism
    can't pick the row whenever at least one orderable column exists.
    The winner agg shuffles on the key, the same partitioning the
    full-outer join needs, so the exchange is reused, not added."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"column sets must match: target={sorted(target.columns)} "
            f"source={sorted(source.columns)}"
        )
    nonkey = [c for c in target.columns if c != key]
    source = source.filter(F.col(key).isNotNull())
    ord_cols = [c for c in sorted(nonkey) if _orderable(source.schema[c].dataType)]
    if nonkey and ord_cols:
        ordk = F.struct(*[F.col(c) for c in ord_cols])
        source = (
            source.groupBy(key)
            .agg(F.max_by(F.struct(*[F.col(c) for c in nonkey]), ordk).alias("_row"))
            .select(key, *[F.col(f"_row.{c}").alias(c) for c in nonkey])
        )
    else:
        # No non-key columns, or none orderable: no ordering key exists,
        # so any winner is acceptable — keep the old behavior.
        source = source.dropDuplicates([key])
    t = target.alias("t")
    s = source.alias("s")
    # Branch on KEY presence, not per-column coalesce: a matched source
    # row must win wholesale even where its non-key columns are NULL
    # (coalesce would silently resurrect the target's old value).
    take_source = F.col(f"s.{key}").isNotNull()
    merged_cols = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)
        if c == key
        else F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer").select(
        *merged_cols
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    eff_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 maintenance: apply an update
    batch to the CURRENT rows of a versioned dimension.

    ``current`` columns: key, attrs, valid_from (its open version);
    ``updates`` columns: key, attrs, eff_col (effective timestamp).

    Semantics per key:
    - attrs changed  -> close the old version at eff (valid_to = eff,
      is_current = false) AND open a new one (valid_from = eff).
    - attrs unchanged -> old version passes through untouched (no
      churn versions — the comparison is null-safe so NULL attrs
      compare equal, not 'changed').
    - new key        -> open its first version at eff.
    - key absent from the batch -> passes through.

    The one-row-per-key precondition is ENFORCED here, not assumed
    (the merge_upsert discipline): NULL-key update rows are dropped (a
    NULL key never equi-joins — it would silently become a phantom
    'new key' row), and duplicate update keys collapse to one
    deterministic winner — the greatest (eff, orderable-attrs) tuple,
    i.e. the latest effective change wins, ties broken by the
    name-sorted attribute values. Without the collapse a duplicated
    key would fan the matched dimension row out through the join and
    emit several 'current' versions at once.

    Plan: ONE left join of current×updates on the
    key + one anti-ish branch for brand-new keys — both shuffle on the
    key only, so with dimension and batch bucketed on the key the whole
    maintenance pass is exchange-free. Output: key, attrs, valid_from,
    valid_to (null = open), is_current.
    """
    updates = updates.filter(F.col(key).isNotNull())
    ord_attrs = [c for c in sorted(attr_cols) if _orderable(updates.schema[c].dataType)]
    ordk = F.struct(F.col(eff_col), *[F.col(c) for c in ord_attrs])
    row_cols = [eff_col, *attr_cols]
    updates = (
        updates.groupBy(key)
        .agg(F.max_by(F.struct(*[F.col(c) for c in row_cols]), ordk).alias("_row"))
        .select(key, *[F.col(f"_row.{c}").alias(c) for c in row_cols])
    )
    t = current.alias("t")
    s = updates.alias("s")
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "left")

    # Existing versions: close if changed, else pass through open.
    existing = j.select(
        F.col(f"t.{key}").alias(key),
        *[F.col(f"t.{c}").alias(c) for c in attr_cols],
        F.col("t.valid_from").alias("valid_from"),
        F.when(F.col(f"s.{key}").isNotNull() & changed, F.col(f"s.{eff_col}"))
        .otherwise(F.lit(None).cast(current.schema["valid_from"].dataType))
        .alias("valid_to"),
        (~(F.col(f"s.{key}").isNotNull() & changed)).alias("is_current"),
    )
    # New versions for changed keys.
    reopened = j.filter(F.col(f"s.{key}").isNotNull() & changed).select(
        F.col(f"t.{key}").alias(key),
        *[F.col(f"s.{c}").alias(c) for c in attr_cols],
        F.col(f"s.{eff_col}").alias("valid_from"),
        F.lit(None).cast(current.schema["valid_from"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # First versions for brand-new keys.
    fresh = s.join(t, F.col(f"s.{key}") == F.col(f"t.{key}"), "left_anti").select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(eff_col).alias("valid_from"),
        F.lit(None).cast(current.schema["valid_from"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return existing.unionByName(reopened).unionByName(fresh)


def apply_cdc(
    snapshot: DataFrame,
    log: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture log to a base snapshot — the Delta/
    Iceberg change-feed consumption pattern a 100 TB pipeline replays
    nightly, composed from plain DataFrames.

    ``log`` columns: key, seq_col (monotone per key), op_col in
    {'I','U','D'}, plus the payload columns of ``snapshot``. Semantics:
    per key only the HIGHEST-seq log row matters (earlier entries are
    superseded); a final 'D' removes the key, a final 'I'/'U' replaces
    (or creates) the row wholesale; keys untouched by the log pass
    through.

    Plan: one per-key max_by to collapse the log (map-side combinable,
    no window over a global sort), then ONE full-outer join with the
    snapshot — both steps shuffle on the key only, so with snapshot and
    log bucketed on the key the apply is exchange-free at any scale.
    NULL-key log rows are dropped (they can never equi-join; keeping
    them would fabricate phantom inserts).
    """
    payload = [c for c in snapshot.columns if c != key]
    log = log.filter(F.col(key).isNotNull())
    latest = (
        log.groupBy(key)
        .agg(
            F.max_by(
                F.struct(F.col(op_col), *[F.col(c) for c in payload]),
                F.col(seq_col),
            ).alias("_c")
        )
        .select(
            key,
            F.col(f"_c.{op_col}").alias(op_col),
            *[F.col(f"_c.{c}").alias(c) for c in payload],
        )
    )
    t = snapshot.alias("t")
    s = latest.alias("s")
    j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    alive = F.col(f"s.{op_col}").isNull() | (F.col(f"s.{op_col}") != F.lit("D"))
    return j.filter(alive).select(
        F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}")).alias(key),
        *[
            F.when(F.col(f"s.{op_col}").isNotNull(), F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in payload
        ],
    )
