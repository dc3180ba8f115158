from fairy_spark.sources.tables import TABLE_NAMES, load_tables, register_views, table_path

__all__ = ["TABLE_NAMES", "load_tables", "register_views", "table_path"]
