"""Engine-deterministic transcendental math from IEEE basic ops.

The fixed-point exactness contract used across this engine (sparse
cosine, PageRank, classifier training, Gram matrix) turns float sums
into BIGINT sums, but any weight DERIVED through a libm transcendental
(``ln``, ``exp``, ``pow``) re-opens a cross-engine crack: IEEE-754
mandates correct rounding only for ``+ - * /`` and ``sqrt``, so
Spark's JVM ``Math.log`` and DuckDB's C libm ``ln`` may differ in the
last ulp, and a last-ulp difference at a ``round(x*scale)`` half-way
boundary flips a BIGINT weight (round-10 advice item on
``sparse_cosine_pairs``).

Fix: compute the logarithm from basic ops only, with an IDENTICAL
expression tree on both engines — every intermediate is then
bit-identical by the IEEE correct-rounding guarantee, so the rounded
fixed-point weight cannot diverge. ``ln_ratio_det`` evaluates
``ln(num/den)`` for integer ``num >= den >= 1`` via power-of-two range
reduction (integer bit length, no ``log2``) plus the atanh series:

    x = num/den = 2^e * m,  m in [1, 2]
    t = (m-1)/(m+1)  (|t| <= 1/3)
    ln(m) ~= 2t * (1 + t^2/3 + t^4/5 + t^6/7 + t^8/9 + t^10/11)
    ln(x)  = e*LN2 + ln(m)

Truncation error <= 2*(1/3)^13/13 < 1e-7 absolute — irrelevant for an
idf weight, while determinism is total: ``tests/test_textnorm.py``
sweeps (num, den) pairs and asserts Spark-vs-DuckDB bit equality of
the double. The reference computes no idf at all (its similarity is
exact-key matching, e.g. grid/station lookups); this contract exists
for the Spark engine's corpus extensions.

Shared constants: ``LN2_DET`` is the correctly-rounded double for
ln 2; decimal-literal parsing is correctly rounded in both engines, so
the literal yields the same bits. The reciprocal constants are written
as runtime divisions ``1.0/3.0`` etc. — one correctly-rounded op each,
identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

LN2_DET = "0.6931471805599453"


def ln_ratio_det(num: Column, den: Column) -> Column:
    """Deterministic ``ln(num/den)`` (Spark side) for integer columns
    ``num >= den >= 1``. Mirrors :func:`ln_ratio_det_sql` op-for-op."""
    x = num.cast("double") / den.cast("double")
    # floor(x) >= 1; bit_length(floor(x)) - 1 == floor(log2(x)) for
    # x >= 1. bin() renders without leading zeros on both engines.
    fl = F.floor(x).cast("long")
    e = F.length(F.bin(fl)) - F.lit(1)
    # 2^e by integer shift (exact), then m = x / 2^e is a pure
    # exponent adjustment — no rounding, m in [1, 2].
    pow2 = F.call_function(
        "shiftleft", F.lit(1).cast("long"), e.cast("int")
    ).cast("double")
    m = x / pow2
    t = (m - F.lit(1.0)) / (m + F.lit(1.0))
    t2 = t * t
    s = F.lit(1.0) + t2 * (
        F.lit(1.0) / F.lit(3.0)
        + t2
        * (
            F.lit(1.0) / F.lit(5.0)
            + t2
            * (
                F.lit(1.0) / F.lit(7.0)
                + t2
                * (F.lit(1.0) / F.lit(9.0) + t2 * (F.lit(1.0) / F.lit(11.0)))
            )
        )
    )
    return e.cast("double") * F.lit(float(LN2_DET)) + F.lit(2.0) * t * s


def ln_ratio_det_sql(num: str, den: str) -> str:
    """Deterministic ``ln(num/den)`` as an ANSI-SQL expression string
    (DuckDB oracle side), the exact expression tree of
    :func:`ln_ratio_det`: same ops, same order, same constants."""
    x = f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
    fl = f"CAST(floor({x}) AS BIGINT)"
    e = f"(length(bin({fl})) - 1)"
    pow2 = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    m = f"({x} / {pow2})"
    t = f"(({m} - 1.0) / ({m} + 1.0))"
    t2 = f"({t} * {t})"
    s = (
        f"(1.0 + {t2} * (1.0/3.0 + {t2} * (1.0/5.0 + {t2} * "
        f"(1.0/7.0 + {t2} * (1.0/9.0 + {t2} * (1.0/11.0))))))"
    )
    return f"(CAST({e} AS DOUBLE) * {LN2_DET} + 2.0 * {t} * {s})"
