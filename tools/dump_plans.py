"""Dump ``.explain("formatted")`` for registry queries to text files.

Used to produce the per-round plan evidence committed under
``plans/r<N>/`` (``<query>_before.txt`` captured at the prior round's
HEAD via a git worktree, ``<query>_after.txt`` at the current HEAD).

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] [name ...]
       (default sf_dir /root/testdata/sf0.01; default names = all)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

from curw_flo2d_data_manager_spark import queries as q
from curw_flo2d_data_manager_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:] or sorted(q.queries().keys())
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    reg = q.queries()
    for name in names:
        if name not in reg:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = reg[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"OK   {name} -> {path}")
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
