"""Queries exercising the Python-UDF surface and the multimodal
column pipeline (SURVEY.md §2.B UDF/UDAF/UDTF + multimodal carry).

The UDFs are Arrow-vectorized Python; the oracles re-express the same
deterministic math in SQL — proving the UDF path computes exactly
what the declarative path would, which is the correctness contract
for custom operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.functions.udfs import (
    batch_enrich,
    logistic_quality_score,
    make_token_udtf,
    weighted_avg_udaf,
    zscore_per_group,
)
from fairy_spark.operators.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    media_table_from_documents,
    resize_stub,
)
from fairy_spark.operators.text import mean_token_len, tokenize
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "udf_pandas_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(lower(text), '\\s+')) AS DOUBLE) AS n_words,
             list_reduce(list_prepend(0.0,
               list_transform(string_split_regex(lower(text), '\\s+'),
                              x -> CAST(LENGTH(x) AS DOUBLE))), (a,b) -> a+b)
               / LEN(string_split_regex(lower(text), '\\s+')) AS mean_len
      FROM documents
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(0.05 * n_words + 0.5 * mean_len - 6.0))), 6) AS quality
    FROM t
    ORDER BY doc_id
    """,
)
def udf_pandas_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("double").alias("n_words"),
        mean_token_len(tokenize(F.col("text"))).alias("mean_len"),
    )
    return (
        t.select(
            "doc_id",
            F.round(logistic_quality_score(F.col("n_words"), F.col("mean_len")), 6).alias(
                "quality"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "udf_group_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / STDDEV_SAMP(o_totalprice) OVER w, 6) AS z
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY COUNT(*) OVER w > 1
    ORDER BY o_custkey, o_orderkey
    """,
)
def udf_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_n"))
    multi = o.join(counts.filter(F.col("_n") > 1).select("o_custkey"), "o_custkey")
    z = zscore_per_group(multi)
    return z.select("o_custkey", "o_orderkey", F.round("z", 6).alias("z")).orderBy(
        "o_custkey", "o_orderkey"
    )


@register(
    "udf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = weighted_avg_udaf(li)
    return w.select("l_returnflag", F.round("wavg_price", 6).alias("wavg_price")).orderBy(
        "l_returnflag"
    )


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value / 10) AS BIGINT) AS value_bucket,
           CAST(value >= 50.0 AS BOOLEAN) AS is_high
    FROM events
    WHERE user_id <= 30
    ORDER BY event_id
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    return batch_enrich(ev).select("event_id", "value_bucket", "is_high").orderBy("event_id")


@register(
    "udf_tokenize_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM documents WHERE doc_id <= 20)
    SELECT t.doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t.toks[u.i] AS token
    FROM t, UNNEST(generate_series(1, len(t.toks))) AS u(i)
    ORDER BY doc_id, pos
    """,
)
def udf_tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("fairy_tokenize", make_token_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs_in d, LATERAL fairy_tokenize(d.text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "mm_payload_carry",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           MD5(text) AS checksum,
           'image/fake' AS media_type
    FROM documents
    ORDER BY media_id
    """,
)
def mm_payload_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload carry (A1/A2 blob semantics): metadata is
    queryable without touching payload bytes — column pruning drops the
    blob column from the scan entirely."""
    media = media_table_from_documents(load_table(spark, sf_dir, "documents"))
    return (
        media.select(
            "media_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.checksum").alias("checksum"),
            "media_type",
        )
        .orderBy("media_id")
    )


@register(
    "mm_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           64 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64 AS width,
           64 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64 AS height,
           3 AS n_channels,
           array_to_string(list_transform(generate_series(1, 8),
                          i -> printf('%.6f', CAST(concat('0x', substr(md5(text), 2*i-1, 2)) AS INT) / 255.0)), ',') AS feature
    FROM documents
    WHERE doc_id <= 50
    ORDER BY media_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode+featurize with the deterministic fake decoder
    (real codecs stubbed — see operators/multimodal.py). The oracle
    recomputes the fake decode in SQL, checking the batch plumbing
    end-to-end. The feature vector is emitted as a fixed-point joined
    string (%.6f both sides): driver hashing can't handle array cells.
    x/255.0 can never land on a 1e-6 midpoint (midpoints are
    terminating decimals; x/255 in lowest terms only terminates when it
    is exact at coarser precision), so printf vs Java rounding agree."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    media = media_table_from_documents(docs)
    return (
        decode_and_featurize(media, decode_mode="fake")
        .withColumn(
            "feature",
            F.array_join(
                F.transform("feature", lambda x: F.format_string("%.6f", x)), ","
            ),
        )
        .orderBy("media_id")
    )


@register(
    "mm_frame_plan",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, LEAST(LENGTH(text) // 10 + 1, 4) AS n_frames
               FROM documents WHERE doc_id <= 30)
    SELECT media_id, CAST(u.i AS INTEGER) AS frame_index, CAST(u.i * 10 AS INTEGER) AS byte_offset
    FROM m, UNNEST(generate_series(0, n_frames - 1)) AS u(i)
    ORDER BY media_id, frame_index
    """,
)
def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 30)
    media = media_table_from_documents(docs)
    return (
        frame_sample_plan(media, every_n=10, max_frames=4)
        .select("media_id", "frame_index", F.col("byte_offset").cast("int").alias("byte_offset"))
        .orderBy("media_id", "frame_index")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_reduce(list_prepend(0.0,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)), (a,b) -> a+b)), 6) AS l2_norm
    FROM embeddings
    WHERE vec_id <= 200
    ORDER BY vec_id
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow vector norms — Arrow-native batch processing
    (functions/udfs.py:arrow_norm_stats). numpy's pairwise summation
    differs from a strict left fold at ~1e-15 relative, far inside the
    1e-6 rounding, so the oracle still matches exactly."""
    from fairy_spark.functions.udfs import arrow_norm_stats

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 200)
    return (
        arrow_norm_stats(e)
        .select("vec_id", F.round("l2_norm", 6).alias("l2_norm"))
        .orderBy("vec_id")
    )


@register(
    "mm_resize_plan",
    oracle="""
    WITH d AS (
      SELECT doc_id AS media_id,
             64 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64 AS width,
             64 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64 AS height
      FROM documents WHERE doc_id <= 50
    )
    SELECT media_id,
           CAST(FLOOR(width  * (224.0 / GREATEST(width, height))) AS INT) AS resized_w,
           CAST(FLOOR(height * (224.0 / GREATEST(width, height))) AS INT) AS resized_h
    FROM d
    ORDER BY media_id
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize geometry over the decoded (fake) dims —
    JVM-side arithmetic; the pixel resample lives in the stubbed decode
    (operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    media = media_table_from_documents(docs)
    decoded = decode_and_featurize(media, decode_mode="fake")
    return (
        resize_stub(decoded, target=224)
        .select("media_id", "resized_w", "resized_h")
        .orderBy("media_id")
    )


@register(
    "udf_udtf_table_arg",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marks AS (
      SELECT user_id,
             SUM(CASE WHEN prev IS NULL OR prev != event_type THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM seq
    ), runs AS (
      SELECT user_id, run_id, COUNT(*) AS run_len
      FROM marks GROUP BY user_id, run_id
    )
    SELECT user_id,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run
    FROM runs
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def udf_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF over a TABLE argument with PARTITION BY / ORDER BY
    (Spark 4 polymorphic UDTFs): run-length encodes each user's
    ordered event-type sequence inside the UDTF and emits one
    summary row per partition from terminate() — the custom
    ordered-partition fold that scalar UDFs and LATERAL generators
    can't express (and the API twin of applyInPandasWithState's
    batch fold, but arbitrary-Python rather than pandas-frame).
    Scale: Spark hash-partitions on user_id and sorts within
    partitions BEFORE the UDTF — one exchange, the sessionize
    discipline — and per-partition state is O(1) (five counters).
    The oracle rebuilds identical runs via the gaps-and-islands CTE,
    so the Python fold is value-checked against pure SQL."""
    from fairy_spark.functions.udfs import make_rle_udtf

    load_table(spark, sf_dir, "events").createOrReplaceTempView("rle_events_in")
    spark.udtf.register("fairy_rle", make_rle_udtf())
    return spark.sql(
        """
        SELECT user_id, n_events, n_runs, longest_run
        FROM fairy_rle(TABLE(SELECT user_id, ts, event_id, event_type
                             FROM rle_events_in)
                       PARTITION BY user_id ORDER BY (ts, event_id))
        ORDER BY user_id
        """
    )


@register(
    "mm_audio_energy",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id <= 30
    ), w AS (
      SELECT media_id, u.i AS window_index,
             substr(text, CAST(u.i * 64 + 1 AS INT), 64) AS chunk
      FROM m, UNNEST(generate_series(0,
             CAST(CEIL(LENGTH(text) / 64.0) AS INT) - 1)) AS u(i)
    )
    SELECT media_id, CAST(window_index AS INTEGER) AS window_index,
           CAST(LENGTH(chunk) AS BIGINT) AS n_samples,
           CAST(FLOOR(sqrt(
             CAST(list_reduce(list_prepend(0,
               list_transform(range(1, LENGTH(chunk) + 1),
                 j -> (ord(substr(chunk, j, 1)) - 128)
                      * (ord(substr(chunk, j, 1)) - 128))),
               (a, b) -> a + b) AS DOUBLE) / LENGTH(chunk))
             * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS rms
    FROM w
    ORDER BY media_id, window_index
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over opaque audio payloads — the AUDIO leg
    of the multimodal family (decode/resize/frame-sample cover
    image/video): payload bytes stand in for 8-bit PCM (deterministic
    fake decode; libs absent per the brief), windows of 64 samples
    reduce to exact integer (n, Σ sample²) inside an Arrow-vectorized
    mapInPandas (operators/multimodal.py::audio_energy_windows), and
    the RMS = √(Σ/n) transcendental runs JVM-SIDE on the exact ints —
    the Python boundary ships only integers, so the float sequence is
    engine-identical. The oracle recomputes per-window energy
    analytically from the text bytes (ASCII corpus ⇒ byte == ord).
    Scale: fan-out is len/64 rows per payload (row-linear), no
    shuffle before the final presentation sort; batches arrive
    Arrow-columnar and numpy folds windows without per-sample
    Python."""
    from fairy_spark.operators.multimodal import (
        audio_energy_windows,
        media_table_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 30)
    media = media_table_from_documents(docs)
    win = audio_energy_windows(media, window_bytes=64)
    rms = F.floor(
        F.sqrt(F.col("sumsq").cast("double") / F.col("n_samples")) * 1000000
        + F.lit(0.5)
    ).cast("bigint") / 1000000.0
    return (
        win.select(
            "media_id",
            "window_index",
            "n_samples",
            rms.alias("rms"),
        )
        .orderBy("media_id", "window_index")
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS INTEGER) AS bpeish_tokens
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF (functions/udfs.py::make_iter_tokencount_udf)
    — the iterator protocol that amortizes per-executor setup (here a
    compiled tokenizer pattern standing in for a model load) once per
    partition while streaming Arrow batches. Value-checked against
    the pure-SQL regexp count (text_token_count's bpeish column), so
    the protocol's batch iteration provably computes what the
    declarative path would. At 100 TB this is THE protocol for
    UDF-with-heavy-init (tokenizers, ONNX sessions): init cost is
    per-partition, not per-batch."""
    from fairy_spark.functions.udfs import make_iter_tokencount_udf

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    fn = make_iter_tokencount_udf()
    return d.select("doc_id", fn(F.col("text")).alias("bpeish_tokens")).orderBy(
        "doc_id"
    )


@register(
    "udf_group_apply_arrow",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(MIN(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(MAX(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def udf_group_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedData.applyInArrow (Spark 4) — the Arrow-native grouped-map
    twin of udf_group_zscore's applyInPandas: each market segment's rows
    arrive as ONE pyarrow.Table (zero pandas conversion overhead) and the
    per-group stats are computed with pyarrow.compute kernels over an
    int64 cents column prepared JVM-side, so the custom-operator path is
    bit-exact against the declarative GROUP BY oracle. This is the API a
    100-TB pipeline wants for group-wise Python that touches large
    groups: Arrow record batches stream straight into C++ kernels with
    no per-row Python and no pandas materialization. Parallelism is one
    task per group (5 segments here) — real deployments key by a
    higher-cardinality column; the contract under test is the Arrow
    fold, not the fan-out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )

    def seg_stats(table: "pa.Table") -> "pa.Table":
        cents = table.column("cents")
        return pa.table(
            {
                "c_mktsegment": [table.column("c_mktsegment")[0].as_py()],
                "n_cust": pa.array([table.num_rows], pa.int64()),
                "bal_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "min_cents": pa.array([pc.min(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
            }
        )

    out_schema = (
        "c_mktsegment string, n_cust bigint, bal_cents bigint, "
        "min_cents bigint, max_cents bigint"
    )
    return (
        cust.groupBy("c_mktsegment")
        .applyInArrow(seg_stats, schema=out_schema)
        .orderBy("c_mktsegment")
    )


@register(
    "mm_frame_extract",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             LEAST(LENGTH(text) // 10 + 1, 4) AS n_frames
      FROM documents WHERE doc_id <= 30
    )
    SELECT media_id, CAST(u.i AS INTEGER) AS frame_index,
           CAST(LENGTH(substring(text, u.i * 10 + 1, 16)) AS BIGINT) AS frame_bytes,
           md5(substring(text, u.i * 10 + 1, 16)) AS frame_md5
    FROM m, UNNEST(generate_series(0, n_frames - 1)) AS u(i)
    ORDER BY media_id, frame_index
    """,
)
def mm_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the frame-sampling plan mm_frame_plan only computes:
    each scheduled (media_id, frame_index, byte_offset) row slices its
    16-byte 'frame' out of the opaque binary payload inside an
    Arrow-batched mapInPandas stage — the exact plumbing a real video
    pipeline needs (binary column in, per-frame rows out, byte-exact
    offsets), with the codec itself stubbed per the multimodal
    contract (operators/multimodal.py). The payload rides the explode
    JVM-side so each Python batch already holds (offset, payload)
    pairs — no second join, ≤4 frame rows per asset. Verification:
    frame length + md5 of the sliced bytes; the oracle mirrors with
    VARCHAR substring, valid because these stand-in payloads are the
    documents' ASCII text (asserted by the pure-ASCII fixture; real
    media would compare against a binary-capable oracle or the
    rows-only gate)."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 30)
    media = media_table_from_documents(docs)
    # floor-division on both engines (see frame_sample_plan): a DuckDB
    # CAST(x/10 AS INT) rounds while this truncated, diverging for any
    # payload shorter than ~35 bytes with length % 10 >= 5.
    n_frames = F.least(
        F.floor(F.col("meta.n_bytes") / 10).cast("int") + 1, F.lit(4)
    )
    plan = media.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("byte_offset", F.col("frame_index") * 10)

    def slice_frames(batches):
        for pdf in batches:
            out = pdf[["media_id", "frame_index"]].copy()
            sliced = [
                bytes(p)[o : o + 16]
                for p, o in zip(pdf["payload"], pdf["byte_offset"])
            ]
            out["frame_bytes"] = [len(s) for s in sliced]
            out["frame_md5"] = [hashlib.md5(s).hexdigest() for s in sliced]
            yield out

    schema = "media_id long, frame_index int, frame_bytes long, frame_md5 string"
    return (
        plan.mapInPandas(slice_frames, schema=schema)
        .withColumn("frame_index", F.col("frame_index").cast("int"))
        .orderBy("media_id", "frame_index")
    )


@register(
    "mm_image_downsample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             CAST(LENGTH(text) AS INTEGER) AS n
      FROM documents WHERE doc_id <= 60
    ), d AS (
      SELECT media_id, text, n // 16 AS in_h, (n // 16) // 2 AS oh FROM m
    ), p AS (
      SELECT media_id, in_h, oh,
             CASE WHEN oh > 0 THEN
               list_transform(generate_series(0, oh * 8 - 1), idx ->
                 ( ord(substr(text, ((idx // 8) * 2) * 16 + ((idx % 8) * 2) + 1, 1))
                 + ord(substr(text, ((idx // 8) * 2) * 16 + ((idx % 8) * 2) + 2, 1))
                 + ord(substr(text, ((idx // 8) * 2 + 1) * 16 + ((idx % 8) * 2) + 1, 1))
                 + ord(substr(text, ((idx // 8) * 2 + 1) * 16 + ((idx % 8) * 2) + 2, 1))
                 ) // 4)
             ELSE CAST([] AS BIGINT[]) END AS pooled
      FROM d
    )
    SELECT media_id,
           16 AS in_w,
           CAST(in_h AS INTEGER) AS in_h,
           CAST(CASE WHEN oh > 0 THEN 8 ELSE 0 END AS INTEGER) AS out_w,
           CAST(oh AS INTEGER) AS out_h,
           CAST(len(pooled) AS BIGINT) AS n_out_bytes,
           list_reduce(list_prepend(CAST(0 AS BIGINT), pooled),
                       (a, b) -> (a * 131 + b) % 1000000007) AS pool_checksum
    FROM p
    ORDER BY media_id
    """,
)
def mm_image_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 average-pool image downsample — the image-PIXEL leg of the
    multimodal family (mm_frame_extract slices bytes, resize covers
    geometry; this is the stage that actually reduces pixels):
    payload bytes stand in for a 16-wide row-major 8-bit grayscale
    image, every 2×2 block floors to its integer mean inside an
    Arrow-vectorized mapInPandas
    (operators/multimodal.py::image_downsample_pool), the pooled
    image is rebuilt as REAL bytes executor-side, and the row ships
    dims + an order-pinned checksum over the pooled pixel stream so
    the whole pixel algebra is engine-hashable (ASCII corpus ⇒
    byte == ord, the mm_frame_extract discipline). The Python
    boundary emits integers only; numpy does the strided 2×2 sums.
    Scale: one row per payload, row-linear, no shuffle before the
    presentation sort — exactly how a 100 TB thumbnail pass runs,
    with a real decoder slotting in at the reshape."""
    from fairy_spark.operators.multimodal import image_downsample_pool

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 60)
    media = media_table_from_documents(docs)
    return (
        image_downsample_pool(media, in_w=16)
        .withColumn("in_w", F.col("in_w").cast("int"))
        .orderBy("media_id")
    )
