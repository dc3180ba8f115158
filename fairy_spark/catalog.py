"""Catalog — namespace/metadata surface.

Parity with the reference's FUSE metadata layer (SURVEY.md §2.A
A13-A19, A24): inode lookup/create/getattr and directory listing over
`InodeManager` + `ListStatusCache`
(fuse/src/uring_fuse/uring_fs/inode.rs:72-130, list_cache.rs:15-26,
uring_fs/mod.rs:39-214). Spark already maintains the equivalent index
(`spark.catalog` + InMemoryFileIndex); this is a thin typed wrapper
plus the listing-pagination op (A17 readdir offset paging).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class TableInfo:
    name: str
    columns: list[tuple[str, str]]  # (name, dataType)
    is_temporary: bool


class TableNotFound(KeyError):
    pass


class Catalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # lookup (A13 inode.lookup / A14 inode.get)
    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def describe(self, name: str) -> TableInfo:
        if not self.exists(name):
            raise TableNotFound(name)
        cols = [(c.name, c.dataType) for c in self.spark.catalog.listColumns(name)]
        is_temp = any(
            t.name == name and t.isTemporary for t in self.spark.catalog.listTables()
        )
        return TableInfo(name=name, columns=cols, is_temporary=is_temp)

    # create (A15 inode.create / A18 fuse create)
    def create_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def create_table(self, name: str, df: DataFrame, mode: str = "overwrite") -> None:
        df.write.mode(mode).format("parquet").saveAsTable(name)

    # listing (A16 ls_cache.get / A17 readdir pagination)
    def list_tables(self) -> list[str]:
        return sorted(t.name for t in self.spark.catalog.listTables())

    def list_tables_page(self, limit: int, offset: int = 0) -> list[str]:
        """Paginated listing — readdir's offset/limit contract
        (uring_fs/mod.rs:116-166 pages cached dirents from an offset)."""
        return self.list_tables()[offset : offset + limit]

    # DDL (A24 rename/unlink family → catalog DDL)
    def rename_table(self, old: str, new: str) -> None:
        self.spark.sql(f"ALTER TABLE {old} RENAME TO {new}")

    def drop(self, name: str) -> None:
        if any(t.name == name and t.isTemporary for t in self.spark.catalog.listTables()):
            self.spark.catalog.dropTempView(name)
        else:
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")

    # table properties (A24 chmod/chown/xattr family,
    # passthrough_fs.rs:137-789): POSIX per-file metadata generalizes
    # to per-table key→value properties — set/read/remove through the
    # metastore, like setxattr/getxattr/removexattr on an inode.
    # Spark reserves some keys (owner, provider, location, ...) the
    # way the kernel reserves xattr namespaces; setting one raises
    # ParseException from the engine.
    @staticmethod
    def _quote(s: str) -> str:
        # Keys/values are interpolated into DDL text; an embedded quote
        # must be doubled (SQL string-literal escaping) or a hostile/
        # accidental value turns into a ParseException or a mangled
        # statement.
        return "'" + str(s).replace("'", "''") + "'"

    def set_properties(self, name: str, props: dict[str, str]) -> None:
        if not self.exists(name):
            raise TableNotFound(name)
        if not props:
            raise ValueError("set_properties requires at least one key")
        kv = ", ".join(
            f"{self._quote(k)}={self._quote(v)}" for k, v in sorted(props.items())
        )
        self.spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({kv})")

    def get_properties(self, name: str) -> dict[str, str]:
        if not self.exists(name):
            raise TableNotFound(name)
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
        # Spark surfaces engine-internal entries (e.g. parquet stats)
        # alongside user keys; expose them all — getxattr semantics,
        # the caller filters by namespace.
        return {r["key"]: r["value"] for r in rows}

    def unset_property(self, name: str, key: str) -> None:
        if not self.exists(name):
            raise TableNotFound(name)
        self.spark.sql(
            f"ALTER TABLE {name} UNSET TBLPROPERTIES IF EXISTS ({self._quote(key)})"
        )

    def row_count(self, name: str) -> int:
        return self.spark.table(name).count()

    def listing_df(self) -> DataFrame:
        """Listing as a DataFrame so pagination composes with the
        relational layer (ORDER BY name LIMIT n OFFSET m)."""
        names = self.list_tables()
        return self.spark.createDataFrame([(n,) for n in names], "name string").orderBy(
            F.col("name")
        )
