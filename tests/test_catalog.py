"""Catalog seam (plans/catalog.py): the sink-table upsert contract
through BOTH realizations — the parquet delta stack (always on; what
the driver correctness queries exercise) and Iceberg MERGE INTO
(engages only when the runtime ships the jars; its integration test
skips in jar-less environments, but the SQL it emits and the seam
plumbing are pinned here regardless)."""

import pytest
from pyspark.sql import functions as F

from memorious_spark.plans.catalog import (
    DeltaStackIO, IcebergIO, iceberg_available, merge_into_sql,
    resolve_catalog,
)
from memorious_spark.plans.storage import RunStore


def test_merge_into_sql_contract():
    sql = merge_into_sql(
        "cat.ns.`db_people`", "batch_v", ["k1", "k2"],
        ["k1", "k2", "name", "__first_seen", "__last_seen"],
    )
    # null-safe key equality (SQL NULL keys must still match themselves)
    assert "t.`k1` <=> s.`k1` AND t.`k2` <=> s.`k2`" in sql
    # latest values win, __last_seen advances...
    assert "t.`name` = s.`name`" in sql
    assert "t.`__last_seen` = s.`__last_seen`" in sql
    # ...but __first_seen is PRESERVED (not in the update set) and
    # keys are never reassigned
    assert "__first_seen` = s" not in sql
    assert "t.`k1` = s.`k1`" not in sql
    assert sql.endswith("WHEN NOT MATCHED THEN INSERT *")
    with pytest.raises(ValueError, match="key"):
        merge_into_sql("t", "s", [], ["a"])


def test_resolve_catalog_fallback(spark, tmp_path):
    store = RunStore(tmp_path, "c", "r1")
    io = resolve_catalog(spark, store)
    assert isinstance(io, DeltaStackIO)
    if not iceberg_available(spark):
        # demanding a catalog without the jar must fail LOUD at
        # resolve time, not at the first mid-crawl MERGE
        with pytest.raises(RuntimeError, match="[Ii]ceberg"):
            resolve_catalog(spark, store, catalog="lake")


def test_delta_stack_io_upsert_semantics(spark, tmp_path):
    """The seam's fallback face must behave exactly like calling the
    RunStore directly — same resolved view, __first_seen preserved."""
    store = RunStore(tmp_path, "c", "r1")
    io = resolve_catalog(spark, store)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    io.upsert(spark, "db_t", b1, ["k"], "2024-01-01 00:00:00")
    io.upsert(spark, "db_t", b2, ["k"], "2024-02-01 00:00:00")
    rows = {r["k"]: r for r in io.read(spark, "db_t").collect()}
    assert rows[1]["v"] == "a"
    assert rows[2]["v"] == "B"
    assert str(rows[2]["__first_seen"]).startswith("2024-01-01")
    assert str(rows[2]["__last_seen"]).startswith("2024-02-01")
    assert rows[3]["v"] == "c"


def test_runstore_routes_through_attached_catalog(spark, tmp_path):
    """With a catalog attached, the SAME sink call sites
    (upsert_shared/read_shared) route db_*/ftm_* tables through it,
    while tag/cache shared tables stay on the parquet path."""
    store = RunStore(tmp_path, "c", "r1")
    calls = []

    class Spy:
        def upsert(self, spark, table, batch, keys, now_ts):
            calls.append(("upsert", table))

        def read(self, spark, table):
            calls.append(("read", table))
            return None

    store.catalog = Spy()
    b = spark.createDataFrame([(1, "a")], "k int, v string")
    store.upsert_shared(spark, "db_t", b, ["k"], "2024-01-01 00:00:00")
    store.read_shared(spark, "db_t")
    assert calls == [("upsert", "db_t"), ("read", "db_t")]
    # non-sink shared tables bypass the catalog entirely
    store.append_shared("tags_x", b)
    got = store.read_shared(spark, "tags_x")
    assert got is not None and got.count() == 1
    assert calls == [("upsert", "db_t"), ("read", "db_t")]


def test_iceberg_merge_upsert_integration(spark, tmp_path):
    """FULL Iceberg path: CTAS on first batch, MERGE INTO on the
    next, snapshot-expiry maintenance. Runs only where the runtime
    ships iceberg-spark-runtime (skips here — the sandbox has no
    jars); the SQL is pinned by test_merge_into_sql_contract above
    either way."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    io = IcebergIO("it", namespace="t_shared")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    io.upsert(spark, "db_t", b1, ["k"], "2024-01-01 00:00:00")
    io.upsert(spark, "db_t", b2, ["k"], "2024-02-01 00:00:00")
    rows = {r["k"]: r for r in io.read(spark, "db_t").collect()}
    assert rows[2]["v"] == "B"
    assert str(rows[2]["__first_seen"]).startswith("2024-01-01")
    assert str(rows[2]["__last_seen"]).startswith("2024-02-01")
    assert rows[1]["v"] == "a" and rows[3]["v"] == "c"
    io.maintain(spark, "db_t")
