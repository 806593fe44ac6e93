#!/usr/bin/env python
"""Render SCALE_FIT.json as the SCALE.md markdown table.

Usage: python tools/scale_fit_table.py [SCALE_FIT.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_FIT.json"
    data = json.load(open(path))
    mults = data.get("mults", [1, 3])
    head = " | ".join(f"{m}×" for m in mults)
    print(f"| query | {head} | ratio9 | exp |")
    print("|---|" + "---|" * (len(mults) + 2))
    for name, row in data["queries"].items():
        if "err" in row:
            print(f"| {name} | ERR {row['err'][:60]} |")
            continue
        cells = " | ".join(f"{row[f't{m}x']:.2f}s" for m in mults)
        r9 = row.get("ratio9", row.get("ratio3", ""))
        print(f"| {name} | {cells} | {r9} | {row.get('exp', '')} |")


if __name__ == "__main__":
    main()
