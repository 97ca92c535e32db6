"""Pluggable catalog IO for the shared sink tables.

The db_*/ftm_* sink tables (reference analogue: memorious's dynamic
``dataset`` SQL tables, memorious/operations/db.py:9-62) need upsert
semantics over a table shared across runs. Two realizations of one
contract:

- :class:`DeltaStackIO` — the engine's own LSM-over-parquet
  (``RunStore.upsert_shared``: O(batch) stamped delta appends,
  read-time resolution, minor compaction). Always available; this is
  what the driver correctness queries exercise.
- :class:`IcebergIO` — a real lakehouse catalog: ``MERGE INTO`` per
  batch (the engine's ``merge_upsert`` semantics — latest values win,
  ``__first_seen`` preserved, ``__last_seen`` advanced) and snapshot
  expiry as the vacuum analogue. Engages only when the runtime ships
  the Iceberg Spark extensions (:func:`iceberg_available`); the
  sandbox does not, so its integration test skips there — the SQL it
  emits is pinned by unit tests either way.

``resolve_catalog`` picks the realization; ``RunStore`` accepts the
result so every sink call site routes through the seam unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "iceberg_available",
    "resolve_catalog",
    "DeltaStackIO",
    "IcebergIO",
    "merge_into_sql",
]


def iceberg_available(spark: SparkSession) -> bool:
    """True when the JVM can load the Iceberg Spark catalog class —
    i.e. the runtime was launched with the iceberg-spark-runtime jar.
    A conf check alone is not enough (a configured catalog with a
    missing jar fails at first use, not at conf time)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def merge_into_sql(
    ident: str,
    source_view: str,
    keys: list[str],
    data_cols: list[str],
) -> str:
    """The engine's upsert contract as one Iceberg ``MERGE INTO``:
    latest batch's data columns win on key match, ``__last_seen``
    advances, ``__first_seen`` is NOT in the update set (preserved
    from the existing row — exactly ``merge_upsert`` /
    ``_read_resolved``'s semantics), new keys insert whole. Pure
    string builder so the emitted SQL is unit-testable without the
    Iceberg jars."""
    if not keys:
        raise ValueError("MERGE INTO needs at least one key column")
    on = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
    sets = ", ".join(
        f"t.`{c}` = s.`{c}`"
        for c in data_cols
        if c not in keys and c != "__first_seen"
    )
    return (
        f"MERGE INTO {ident} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


class DeltaStackIO:
    """The parquet delta-stack realization — delegates to the
    RunStore methods that already implement it. Exists so call sites
    hold ONE interface whichever backend is live."""

    def __init__(self, store):
        self._store = store

    def upsert(self, spark, table, batch, keys, now_ts) -> None:
        self._store.upsert_shared(
            spark, table, batch, keys, now_ts, _direct=True
        )

    def read(self, spark, table) -> DataFrame | None:
        return self._store.read_shared(spark, table, _direct=True)

    def maintain(self, spark, table) -> None:
        """Minor compaction happens inside upsert_shared; nothing
        extra to schedule here."""


class IcebergIO:
    """Catalog-backed realization: one namespace per crawler, one
    Iceberg table per sink table, MERGE INTO per batch, snapshot
    expiry as maintenance. Construct only when
    :func:`iceberg_available` — the first SQL otherwise fails with a
    missing-class error."""

    def __init__(self, catalog: str, namespace: str = "memorious_shared"):
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.`{table}`"

    def upsert(
        self,
        spark: SparkSession,
        table: str,
        batch: DataFrame,
        keys: list[str],
        now_ts: str,
    ) -> None:
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}"
        )
        ts = F.to_timestamp(F.lit(now_ts))
        stamped = (
            (batch.dropDuplicates(keys) if keys else batch)
            .withColumn("__first_seen", ts)
            .withColumn("__last_seen", ts)
        )
        ident = self._ident(table)
        if not spark.catalog.tableExists(ident):
            stamped.writeTo(ident).using("iceberg").create()
            return
        view = f"__memorious_merge_{table}"
        stamped.createOrReplaceTempView(view)
        try:
            spark.sql(
                merge_into_sql(ident, view, keys, stamped.columns)
            )
        finally:
            spark.catalog.dropTempView(view)

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        ident = self._ident(table)
        if not spark.catalog.tableExists(ident):
            return None
        return spark.table(ident)

    def maintain(self, spark: SparkSession, table: str) -> None:
        """Snapshot expiry — the Iceberg analogue of the delta-stack's
        compaction + vacuum: old MERGE snapshots stop pinning data
        files, bounding table history like ``compact_shared`` bounds
        delta count."""
        spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{table}')"
        )


def resolve_catalog(spark: SparkSession, store, catalog: str | None = None):
    """Pick the realization: an explicit ``catalog`` name (a
    configured ``spark.sql.catalog.<name>`` Iceberg catalog) demands
    Iceberg and fails loud if the jar is missing; ``None`` falls back
    to the delta stack — the default everywhere the runtime doesn't
    ship a lakehouse."""
    if catalog is not None:
        if not iceberg_available(spark):
            raise RuntimeError(
                f"catalog {catalog!r} requested but the Iceberg Spark "
                "runtime jar is not on the classpath (launch with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-...)"
            )
        return IcebergIO(catalog)
    return DeltaStackIO(store)
