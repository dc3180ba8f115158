"""fairy_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference system
(beinan/fairy, a Rust distributed cache: KV put/get over hash-bucketed
storage, metadata catalog, chunked scan/ingest, cluster-parallel
execution) as an idiomatic Spark DataFrame/SQL engine, extended with
the full relational operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §1.3): everything is a DataFrame with an
explicit schema; plans are declared via the DataFrame/SQL API so
Catalyst handles pushdown/pruning/join-selection; Python UDFs only
where built-ins genuinely cannot express the semantics, and then only
Arrow-vectorized.
"""

from fairy_spark.config import EngineConfig
from fairy_spark.session import get_spark
from fairy_spark.engine import Engine

__all__ = ["Engine", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
