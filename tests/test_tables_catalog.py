"""The Iceberg/v2-catalog branch of sources/tables.py (VERDICT r4 item 7/8).

This sandbox has no Iceberg jars, so the branch had never executed. Two
layers of coverage land here:

1. a MOCKED-catalog unit test — drives write_table's catalog branch (name
   construction, mode dispatch, partitionedBy pass-through, manifest shape,
   no filesystem manifest) with a fake DataFrame, no JVM catalog needed;
2. a REAL v2-catalog integration test using Spark's built-in
   JDBCTableCatalog over the bundled embedded Derby — the same
   ``spark.sql.catalog.<name>`` config surface an Iceberg catalog uses, so
   ``df.writeTo(...)`` exercises the genuine DataFrameWriterV2 path.
   Skip-marked if the catalog class or driver is unavailable.
"""

import os

import pytest

from entityresolution_capstone_spark.sources import tables as T


class _FakeWriter:
    def __init__(self, log):
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", len(cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))

    def append(self):
        self.log.append(("append",))


class _FakeConf:
    def get(self, key, default=None):
        if key == "spark.sql.catalog.ercs":
            return "org.example.FakeIcebergCatalog"
        return default


class _FakeSession:
    conf = _FakeConf()


class _FakeDF:
    sparkSession = _FakeSession()

    def __init__(self, log):
        self.log = log

    def writeTo(self, name):
        self.log.append(("writeTo", name))
        return _FakeWriter(self.log)


def test_write_table_catalog_branch_mocked(tmp_path):
    log = []
    manifest = T.write_table(
        _FakeDF(log), str(tmp_path / "stage1"), partition_by=["conv_id"]
    )
    assert log == [
        ("writeTo", "ercs.stage1"),
        ("partitionedBy", 1),
        ("createOrReplace",),
    ]
    assert manifest["format"] == "iceberg"
    # catalog commits belong to the catalog: no filesystem manifest is written
    assert not os.path.exists(str(tmp_path / "stage1"))

    log.clear()
    T.write_table(_FakeDF(log), str(tmp_path / "stage1"), mode="append")
    assert log == [("writeTo", "ercs.stage1"), ("append",)]


def test_write_table_v2_catalog_roundtrip(spark, tmp_path):
    """Real DataFrameWriterV2 against Spark's built-in JDBC table catalog
    (embedded Derby). Config surface identical to an Iceberg catalog:
    spark.sql.catalog.<name> = <TableCatalog impl> + impl options."""
    try:
        spark.conf.set(
            "spark.sql.catalog.ercs",
            "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
        )
        spark.conf.set(
            "spark.sql.catalog.ercs.url", "jdbc:derby:memory:ercs;create=true"
        )
        spark.conf.set(
            "spark.sql.catalog.ercs.driver", "org.apache.derby.jdbc.EmbeddedDriver"
        )
        df = spark.createDataFrame(
            [("c1", 1, "hello"), ("c2", 2, "world")],
            "conv_id string, turn_idx int, text string",
        )
        try:
            manifest = T.write_table(df, "/ignored/path/turns_v2")
        except Exception as e:  # pragma: no cover - environment-dependent
            pytest.skip(f"v2 JDBC catalog unavailable in this sandbox: {e}")
        assert manifest["format"] == "iceberg"
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in spark.table("ercs.turns_v2").collect()
        )
        assert got == [("c1", 1, "hello"), ("c2", 2, "world")]
        # append branch
        T.write_table(
            spark.createDataFrame([("c3", 3, "!")], df.schema),
            "/ignored/path/turns_v2",
            mode="append",
        )
        assert spark.table("ercs.turns_v2").count() == 3
    finally:
        for k in (
            "spark.sql.catalog.ercs",
            "spark.sql.catalog.ercs.url",
            "spark.sql.catalog.ercs.driver",
        ):
            spark.conf.unset(k)
