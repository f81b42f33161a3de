"""Regenerate tests/registry_schema_snapshot.json.

Builds every ``queries()`` entry at sf0.001 and records its output
schema (column name + Spark simpleString type, in order). The snapshot
is compared by ``tests/test_registry_schema.py`` so accidental output
drift — a renamed aggregate, a type widening, a new column — is caught
before a driver-window freeze rather than by a certification failure.

Usage: python tools/snapshot_schemas.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from curw_flo2d_data_manager_spark.session import get_spark

SNAPSHOT_PATH = "tests/registry_schema_snapshot.json"


def build_snapshot(spark, sf_dir: str) -> dict[str, list[list[str]]]:
    out: dict[str, list[list[str]]] = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        out[name] = [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
        print(f"{name}: {out[name]}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="snapshot_schemas", shuffle_partitions=8)
    snap = build_snapshot(spark, sf_dir)
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {SNAPSHOT_PATH} ({len(snap)} entries)")


if __name__ == "__main__":
    main()
