"""Python UDF surface (SURVEY.md §2.B UDF/UDAF/UDTF).

Policy: built-ins first — these exist for the cases built-ins can't
express (external Python logic, per-group model-ish computation,
custom table generation). Every UDF here is Arrow-vectorized
(pandas_udf / applyInPandas / mapInPandas); row-at-a-time Python UDFs
are deliberately absent — at 100 TB they are 10-100× slower
(per-row pickle round trips vs Arrow batches).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def logistic_quality_score(n_words: pd.Series, mean_len: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: a toy document quality score
    1/(1+exp(-(0.05*n_words + 0.5*mean_len - 6))). One Arrow batch in,
    one out — numpy math, no per-row Python."""
    z = 0.05 * n_words + 0.5 * mean_len - 6.0
    return 1.0 / (1.0 + (-z).map(math.exp))


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["o_totalprice"].mean()
    sd = pdf["o_totalprice"].std(ddof=1)  # sample stddev = SQL stddev_samp
    z = (pdf["o_totalprice"] - mu) / sd if sd and sd > 0 else pdf["o_totalprice"] * 0.0
    return pd.DataFrame(
        {"o_custkey": pdf["o_custkey"], "o_orderkey": pdf["o_orderkey"], "z": z}
    )


def zscore_per_group(orders: DataFrame) -> DataFrame:
    """Grouped-map (applyInPandas): per-customer z-score of order price.
    The group is the unit of pandas work — state never exceeds one
    group, so memory is bounded by max group size, not table size."""
    return orders.groupBy("o_custkey").applyInPandas(_zscore_group, ZSCORE_SCHEMA)


WEIGHTED_AVG_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("wavg_price", T.DoubleType()),
    ]
)


def _weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    w = pdf["l_quantity"]
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "wavg_price": [(pdf["l_extendedprice"] * w).sum() / w.sum()],
        }
    )


def weighted_avg_udaf(lineitem: DataFrame) -> DataFrame:
    """UDAF via applyInPandas one-row-out (Spark has no Python UDAF —
    SURVEY.md §7.3): quantity-weighted average price per return flag."""
    return lineitem.groupBy("l_returnflag").applyInPandas(
        _weighted_avg, WEIGHTED_AVG_SCHEMA
    )


def batch_enrich(events: DataFrame) -> DataFrame:
    """mapInPandas: per-partition batch iterator — the shape used for
    custom scans/decoders. Adds a value bucket + running flag without
    any shuffle (narrow, partition-local)."""
    schema = T.StructType(
        events.schema.fields
        + [T.StructField("value_bucket", T.LongType()), T.StructField("is_high", T.BooleanType())]
    )

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["value_bucket"] = (pdf["value"] // 10).astype("int64")
            pdf["is_high"] = pdf["value"] >= 50.0
            yield pdf

    return events.mapInPandas(gen, schema)


def make_token_udtf():
    """Python UDTF (Spark >= 3.5): one input row → one row per token
    with its position. The explode-based built-in path covers this in
    production; the UDTF form exists for custom generators that aren't
    array-shaped."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.lower().split()):
                    yield i, tok

    return Tokenize




def make_rle_udtf():
    """Polymorphic UDTF over a TABLE argument (Spark 4): consumes a
    whole PARTITION BY user_id / ORDER BY (ts, event_id) slice and
    emits ONE run-length summary row from terminate() — the
    "aggregate UDTF" shape (stateful over an ordered partition) that
    neither scalar UDFs nor LATERAL generators can express. Spark
    guarantees eval() sees the partition's rows in the declared
    ORDER, so the fold is deterministic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id: bigint, n_events: bigint, n_runs: bigint, longest_run: bigint")
    class RunLength:
        def __init__(self):
            self.user = None
            self.prev = None
            self.n = 0
            self.runs = 0
            self.cur = 0
            self.longest = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            t = row["event_type"]
            if t == self.prev:
                self.cur += 1
            else:
                self.runs += 1
                self.cur = 1
                self.prev = t
            if self.cur > self.longest:
                self.longest = self.cur

        def terminate(self):
            if self.n:
                yield self.user, self.n, self.runs, self.longest

    return RunLength


def arrow_norm_stats(embeddings: DataFrame) -> DataFrame:
    """mapInArrow: per-batch vector norms computed directly on Arrow
    RecordBatches (no pandas materialization — the zero-copy path for
    numeric array columns)."""
    import pyarrow as pa
    import numpy as np

    def gen(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            # list<float> -> flat values reshaped per row
            norms = []
            for i in range(batch.num_rows):
                v = np.asarray(embs[i].as_py(), dtype=np.float64)
                norms.append(float(np.sqrt((v * v).sum())))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norms, type=pa.float64())], ["vec_id", "l2_norm"]
            )

    schema = "vec_id bigint, l2_norm double"
    return embeddings.select("vec_id", "embedding").mapInArrow(gen, schema)


def make_iter_tokencount_udf():
    """Iterator-of-Series pandas UDF (SCALAR_ITER protocol): the
    variant that amortizes expensive per-executor setup — the
    compiled pattern here stands in for a tokenizer/model load —
    ONCE per partition, then streams Arrow batches through it.
    A plain SCALAR pandas UDF re-enters Python per batch with no
    place to hold state; mapInPandas could, but loses scalar-column
    composability. This is the remaining pandas-UDF protocol in the
    §2.B UDF family."""
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def bpeish_count(batches):
        pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")  # "model load", once
        for s in batches:
            yield s.str.lower().map(lambda t: len(pat.findall(t)) if t else 0)

    # Real type objects, not strings: this file's `from __future__ import
    # annotations` stringifies inline hints, and pandas_udf cannot
    # resolve them from a function-local namespace.
    bpeish_count.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    return pandas_udf(bpeish_count, "int")
