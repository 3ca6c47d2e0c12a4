"""Spark-catalog registration of lake tables — the reference's consumer
step re-expressed.

The reference's walkthrough ends with a Glue crawler registering each
``<lake>/<schema>/<table>/`` folder so users query it by NAME through
Athena/Spark SQL (reference README.md, "Query the data lake"). This
module is the SparkSession-native analogue: an external (LOCATION-based)
table per lake folder, so ``spark.sql("SELECT * FROM schema.table")``
works without the user knowing the path. At real scale the same calls
target a shared Hive metastore / Glue catalog — the SQL is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from . import manifest as manifest_mod


def _quote(ident: str) -> str:
    """Backtick-quote a catalog identifier (folder names may carry
    characters SQL identifiers can't)."""
    return "`" + ident.replace("`", "``") + "`"


def register_table(
    spark: SparkSession,
    path: str,
    schema: str,
    table: str,
    partition_keys: Sequence[str] = (),
) -> str:
    """(Re-)register a lake folder as an external catalog table.

    Registration is IDEMPOTENT on the common path: when the table
    already exists with the current data schema, only a refresh (or
    MSCK partition recovery) runs — no DROP, so concurrent SQL readers
    never hit a TABLE_OR_VIEW_NOT_FOUND window between micro-batches.
    Drop + recreate happens only when the lake schema actually changed
    (additive evolution a stale definition would hide); DROP on an
    external table never touches data. Returns the qualified name.
    """
    db, tbl = _quote(schema), _quote(table)
    qualified = f"{db}.{tbl}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    recreate = True
    if spark.catalog.tableExists(qualified):
        current = spark.read.option("mergeSchema", "true").parquet(path).schema
        registered = spark.table(qualified).schema
        data_fields = [
            (f.name, f.dataType) for f in registered.fields
        ]
        recreate = [(f.name, f.dataType) for f in current.fields] != data_fields
    if recreate:
        spark.sql(f"DROP TABLE IF EXISTS {qualified}")
        escaped = path.replace("'", "\\'")
        spark.sql(f"CREATE TABLE {qualified} USING parquet LOCATION '{escaped}'")
    if partition_keys:
        spark.sql(f"MSCK REPAIR TABLE {qualified}")
    else:
        spark.catalog.refreshTable(qualified)
    return qualified


def register_manifest_view(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    """Session-scoped view over a manifest table's CURRENT committed
    version (atomic snapshot + deletion vectors applied — what a raw
    directory-backed external table cannot give). Temp views are not
    db-qualified; callers pick a disambiguated name (e.g.
    ``schema__table``)."""
    df = manifest_mod.read_table(spark, path)
    df.createOrReplaceTempView(name)
    return df
