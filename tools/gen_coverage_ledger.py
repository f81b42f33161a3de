"""Regenerate the driver-certification ledger table in COVERAGE.md
from REGISTRY order + the CORRECTNESS_r*.json files (the round-8
lesson: hand-renumbering 200+ rows is error-prone; the ledger is
derived state and must be produced by script).

Usage: python tools/gen_coverage_ledger.py [round_number]
(round_number defaults to 1 + the highest CORRECTNESS_r*.json).
Rewrites everything from the ledger table header to EOF in
COVERAGE.md.
"""

import glob
import json
import re
import sys


def main() -> None:
    rounds = sorted(
        int(re.search(r"r(\d+)", f).group(1))
        for f in glob.glob("CORRECTNESS_r*.json")
    )
    cur = int(sys.argv[1]) if len(sys.argv) > 1 else rounds[-1] + 1

    green: dict[str, set[int]] = {}
    for r in rounds:
        d = json.load(open(f"CORRECTNESS_r{r:02d}.json"))
        for name, res in d.items():
            ok = res.get("rows_match") and res.get("hash_match") is not False
            if ok:
                green.setdefault(name, set()).add(r)

    sys.path.insert(0, ".")
    from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

    names = list(REGISTRY)
    hdr_rounds = rounds
    header = (
        "| # | entry | "
        + " | ".join(f"r{r}" for r in hdr_rounds)
        + f" | r{cur} window |"
    )
    sep = "|---|---|" + "---|" * (len(hdr_rounds) + 1)
    lines = [header, sep]
    for i, n in enumerate(names):
        cells = [
            "green" if r in green.get(n, set()) else "—" for r in hdr_rounds
        ]
        status = "in window" if i < DRIVER_WINDOW else "local"
        lines.append(
            f"| {i + 1} | `{n}` | " + " | ".join(cells) + f" | {status} |"
        )
    table = "\n".join(lines) + "\n"

    src = open("COVERAGE.md").read()
    m = re.search(r"\| # \| entry \|", src)
    assert m, "ledger table header not found"
    open("COVERAGE.md", "w").write(src[: m.start()] + table)
    print(f"ledger rewritten: {len(names)} rows, window={DRIVER_WINDOW}")


if __name__ == "__main__":
    main()
