"""Fixed-width text rendering expressions (FLO-2D file formats).

The reference renders with Python ``'%.3f'`` + ``str.rjust/ljust``
(e.g. input/inflow/gen_150_inflow.py:108-109, input/chan/gen_chan.py:165-178).
Here each becomes a ``format_string``/``lpad``/``rpad`` Column so the
render happens JVM-side inside codegen, not in the driver.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fw_float(col: Column | str, decimals: int, width: int = 0, ljust: bool = False) -> Column:
    """``'%.{d}f'`` then right-justify (default) or left-justify to
    ``width`` — matches ``('%.3f' % v).rjust(16)`` style rendering."""
    s = F.format_string(f"%.{int(decimals)}f", _c(col))
    if width:
        s = F.rpad(s, width, " ") if ljust else F.lpad(s, width, " ")
    return s


def fw_str(col: Column | str, width: int, ljust: bool = True) -> Column:
    """``str.ljust/rjust(width)`` equivalent."""
    s = _c(col).cast("string")
    return F.rpad(s, width, " ") if ljust else F.lpad(s, width, " ")
