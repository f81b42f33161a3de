"""Registry-wide output-shape gates.

1. **No complex-typed output columns.** The external correctness
   driver canonicalizes query results with pandas ``sort_values``,
   which raises ``TypeError: unhashable type: 'list'`` on array/map/
   struct cells — exactly how ``sim_label_centroids`` errored in the
   round-4 driver window despite producing the right answer. Every
   registry entry must therefore emit scalar columns only.

2. **Schema snapshot.** Column names + types per entry are pinned in
   ``registry_schema_snapshot.json`` so accidental output drift (a
   renamed aggregate, a type widening) is caught by pytest before a
   driver-window freeze, not by a certification mismatch.
   Regenerate after an intentional change:
   ``python tools/snapshot_schemas.py``.

Stream entries execute a real micro-batch replay when constructed, so
they dominate this module's runtime; all other entries are plan-only.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry_mod

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(__file__), "registry_schema_snapshot.json"
)


def complex_columns(schema: StructType) -> list[str]:
    """Names of columns the driver's pandas canon cannot sort."""
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@pytest.fixture(scope="module")
def registry_schemas(spark, sf_dir):
    out = {}
    for name, fn in entry_mod.queries().items():
        out[name] = fn(spark, sf_dir).schema
    return out


def test_no_registry_query_emits_complex_columns(registry_schemas):
    offenders = {
        name: cols
        for name, schema in registry_schemas.items()
        if (cols := complex_columns(schema))
    }
    assert offenders == {}, (
        "driver pandas canon cannot certify array/map/struct outputs; "
        f"posexplode or array_join these: {offenders}"
    )


def test_complex_column_detector_flags_arrays(spark):
    # Prove the gate actually fires: a deliberately array-valued query
    # shape (the pre-fix sim_label_centroids) must be red-flagged.
    df = spark.range(3).select(
        F.col("id").alias("label"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("centroid"),
        F.create_map(F.lit("k"), F.lit(1)).alias("meta"),
        F.struct(F.lit(1).alias("a")).alias("nested"),
    )
    assert complex_columns(df.schema) == ["centroid", "meta", "nested"]


def test_registry_schemas_match_snapshot(registry_schemas):
    with open(SNAPSHOT_PATH) as f:
        expected = json.load(f)
    actual = {
        name: [[f.name, f.dataType.simpleString()] for f in schema.fields]
        for name, schema in registry_schemas.items()
    }
    missing = sorted(set(expected) - set(actual))
    added = sorted(set(actual) - set(expected))
    assert not missing, f"registry lost entries vs snapshot: {missing}"
    assert not added, (
        f"new entries not in snapshot (run tools/snapshot_schemas.py): {added}"
    )
    drifted = {
        name: {"expected": expected[name], "actual": actual[name]}
        for name in expected
        if expected[name] != actual[name]
    }
    assert drifted == {}, f"output schema drift: {drifted}"
