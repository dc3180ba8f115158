"""Query registry — THE CONTRACT surface (SURVEY.md §2.B).

Every implemented operator is declared here as a named query:
  * a Spark callable ``(spark, sf_dir) -> DataFrame``
  * an equivalent ANSI-SQL string for the DuckDB oracle (or None for
    genuinely non-SQL-expressible ops → rows-only check).

``__spark_entry__.py`` re-exports this registry to the driver; the
pytest suite runs the same comparison locally at sf0.01.

Discipline (FIXTURES.md oracle conventions): every computed column is
aliased identically on both sides; doubles are rounded in-query on
both sides so value hashes align; collect_list is always sort_array-
wrapped; no query depends on partition-order nondeterminism.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
FAMILY: dict[str, str] = {}  # query name -> registering module (family)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name}"
        FAMILY[name] = fn.__module__.rsplit(".", 1)[-1]

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Ship the package to Python workers first: UDF-bearing
            # queries crash with ModuleNotFoundError on any driver
            # whose cwd isn't the repo root otherwise (shipping.py).
            from fairy_spark.shipping import ensure_package_shipped

            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from fairy_spark.queries import (  # noqa: F401
        relational,
        joins,
        aggregates,
        windows,
        setops,
        functions_sql,
        subqueries,
        sources_io,
        sampling_misc,
        tpch_like,
        llm,
        streaming_batch,
        udfs_mm,
    )
    # streaming_exec reuses streaming_batch's oracle strings, so it
    # must import after streaming_batch has registered them.
    from fairy_spark.queries import streaming_exec  # noqa: F401


def _interleave_families() -> None:
    """Reorder the registry so any PREFIX covers every family.

    The external correctness gate checked only the first 50 registered
    queries in round 1 (insertion order), leaving whole families — LLM,
    streaming, subqueries, TPC-H shapes, UDFs — with no hard-signal
    entry. Spread each family's queries evenly over the whole ordering
    (item j of an n-item family gets fractional position (j+0.5)/n, then
    a stable sort by that key) so a truncated run still verifies every
    family proportionally. The flagship stays first: the driver's
    entry() smoke check uses it.
    """
    keys_by_family: dict[str, list[str]] = {}
    for name in QUERIES:
        keys_by_family.setdefault(FAMILY[name], []).append(name)
    ranked: list[tuple[float, str]] = []
    for fam_keys in keys_by_family.values():
        n = len(fam_keys)
        for j, name in enumerate(fam_keys):
            ranked.append(((j + 0.5) / n, name))
    ranked.sort(key=lambda t: t[0])
    order = ["q1_pricing_summary"] + [
        n for _, n in ranked if n != "q1_pricing_summary"
    ]
    for name in order:
        QUERIES[name] = QUERIES.pop(name)
        if name in ORACLE:
            ORACLE[name] = ORACLE.pop(name)


_load_all()
_interleave_families()
