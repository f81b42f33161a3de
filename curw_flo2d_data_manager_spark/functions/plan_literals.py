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
from pyspark.sql import Column
from pyspark.sql import functions as F


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
