"""Compact plan literals for constant arrays/matrices.

``F.lit(python_list)`` does NOT create one Literal node — PySpark
expands it recursively into ``array(*[lit(x) for x in xs])``, i.e. a
CreateArray tree with one child per element (verified against the
installed PySpark 4.1 source and the analyzed plan). A k×dim constant
matrix built that way puts k·dim expression nodes into the plan, which
Catalyst re-walks per optimizer rule and codegen reprints.

``F.lit(numpy 1-D array)`` DOES map to a single array Literal node
(``[1.0,2.0,…]`` in the analyzed plan) for float/int/string dtypes.
So: a constant VECTOR is one Literal; a constant MATRIX is one
CreateArray with one Literal child per ROW — k+1 nodes instead of
k·dim. These helpers are the one sanctioned way to embed constant
lookup tables (centroids, codebooks, lexicons, power tables) into a
plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string


def lit_array(values, dtype=None) -> Column:
    """One array-Literal NODE for a constant 1-D sequence (float, int,
    or string elements)."""
    return F.lit(np.asarray(list(values), dtype=dtype))


def lit_matrix(rows, dtype="float64") -> Column:
    """Constant matrix as array<array<…>>: one CreateArray whose
    children are single row Literals — k+1 plan nodes for a k×dim
    matrix (the element-wise form is k·dim)."""
    return F.array(*[F.lit(np.asarray(r, dtype=dtype)) for r in rows])


def lit_cube(cubes, dtype="float64") -> Column:
    """Constant rank-3 tensor (e.g. PQ codebooks, m×ksub×dsub) as
    array<array<array<…>>>: m·(ksub+1)+1 plan nodes instead of
    m·ksub·dsub."""
    return F.array(*[lit_matrix(m, dtype=dtype) for m in cubes])


def literal_rows_df(spark: SparkSession, rows, ddl_schema: str) -> DataFrame:
    """Small constant-rows DataFrame as a pure JVM literal plan.

    ``spark.createDataFrame(small_list, ...)`` routes every constant
    block through ``applySchemaToPythonRDD`` — a Python-RDD scan with
    UnknownPartitioning that breaks whole-stage codegen at the union
    and costs ~0.3 s of fixed overhead PER BLOCK in a timed query
    (measured round 14: the OUTFLOW render's two constant blocks were
    0.95 s of its 1.43 s wall). Building the same rows as
    ``inline(array(struct(...)))`` over ``spark.range(1)`` keeps the
    whole thing a codegen'd JVM projection.

    ``rows`` is a sequence of tuples of plain-Python constants (None
    allowed); ``ddl_schema`` the usual DDL string, e.g.
    ``"block_rank int, intra_rank long, line string"``. Intended for
    header/footer/sentinel blocks of at most a few hundred rows — a
    large list belongs in a real relation, not the plan.
    """
    schema = _parse_datatype_string(ddl_schema)
    if not rows:
        # ``inline(array())`` cannot type an empty array — emit a
        # typed ZERO-ROW projection over range(0) instead (same
        # schema, still a pure JVM plan; hit by e.g. global row
        # numbering of an empty relation)
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, schema.fields)
            ]
        )
        for row in rows
    ]
    # nullability note: a field whose literals are all non-NULL infers
    # non-nullable (tighter than createDataFrame's all-nullable); that
    # is accurate metadata and unions with nullable relations widen it
    return spark.range(1).select(F.inline(F.array(*structs)))
