"""Catalog namespace tests — A13-A19/A24 parity: create → lookup →
describe → list/page → rename → drop lifecycle."""

from __future__ import annotations

import pytest

from fairy_spark.catalog import Catalog, TableNotFound


@pytest.fixture()
def catalog(spark):
    return Catalog(spark)


def test_view_lifecycle(catalog, spark):
    df = spark.range(10).withColumnRenamed("id", "n")
    catalog.create_view("cat_test_view", df)
    assert catalog.exists("cat_test_view")
    info = catalog.describe("cat_test_view")
    assert info.columns == [("n", "bigint")]
    assert info.is_temporary
    assert catalog.row_count("cat_test_view") == 10
    catalog.drop("cat_test_view")
    assert not catalog.exists("cat_test_view")


def test_describe_missing_raises(catalog):
    with pytest.raises(TableNotFound):
        catalog.describe("does_not_exist_xyz")


def test_table_lifecycle_and_rename(catalog, spark):
    df = spark.range(5)
    catalog.create_table("cat_test_tbl", df)
    assert catalog.exists("cat_test_tbl")
    catalog.rename_table("cat_test_tbl", "cat_test_tbl2")
    assert catalog.exists("cat_test_tbl2")
    assert not catalog.exists("cat_test_tbl")
    assert catalog.row_count("cat_test_tbl2") == 5
    catalog.drop("cat_test_tbl2")
    assert not catalog.exists("cat_test_tbl2")


def test_listing_pagination(catalog, spark):
    for i in range(5):
        catalog.create_view(f"cat_page_{i}", spark.range(1))
    all_tables = catalog.list_tables()
    page = catalog.list_tables_page(limit=2, offset=1)
    assert page == all_tables[1:3]
    for i in range(5):
        catalog.drop(f"cat_page_{i}")


def test_table_properties_xattr_lifecycle(catalog, spark):
    """A24 xattr family analog (passthrough_fs.rs setxattr/getxattr/
    listxattr/removexattr): set → read back → overwrite → remove."""
    catalog.create_table("cat_props_tbl", spark.range(3))
    try:
        catalog.set_properties("cat_props_tbl", {"created_by": "alice", "tier": "hot"})
        props = catalog.get_properties("cat_props_tbl")
        assert props["created_by"] == "alice" and props["tier"] == "hot"
        # overwrite one key, keep the other (setxattr replace semantics)
        catalog.set_properties("cat_props_tbl", {"tier": "cold"})
        props = catalog.get_properties("cat_props_tbl")
        assert props["created_by"] == "alice" and props["tier"] == "cold"
        # remove (removexattr); missing-key removal is a no-op
        catalog.unset_property("cat_props_tbl", "tier")
        catalog.unset_property("cat_props_tbl", "never_set")
        assert "tier" not in catalog.get_properties("cat_props_tbl")
    finally:
        catalog.drop("cat_props_tbl")


def test_table_properties_missing_table_raises(catalog):
    import pytest
    from fairy_spark.catalog import TableNotFound

    with pytest.raises(TableNotFound):
        catalog.set_properties("no_such_tbl_xyz", {"a": "b"})
    with pytest.raises(TableNotFound):
        catalog.get_properties("no_such_tbl_xyz")


def test_table_properties_quote_escaping_and_empty_props(catalog, spark):
    """ADVICE r4: keys/values containing quotes are DDL-interpolated —
    they must be escaped (doubled), not turned into a ParseException or
    a mangled statement; an empty props dict raises instead of emitting
    SET TBLPROPERTIES ()."""
    import pytest

    catalog.create_table("cat_quote_tbl", spark.range(2))
    try:
        catalog.set_properties("cat_quote_tbl", {"it's": "O'Brien's 'value'"})
        props = catalog.get_properties("cat_quote_tbl")
        assert props["it's"] == "O'Brien's 'value'"
        catalog.unset_property("cat_quote_tbl", "it's")
        assert "it's" not in catalog.get_properties("cat_quote_tbl")
        with pytest.raises(ValueError, match="at least one"):
            catalog.set_properties("cat_quote_tbl", {})
    finally:
        catalog.drop("cat_quote_tbl")
