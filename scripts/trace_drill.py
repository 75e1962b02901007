"""Drill into a saved XProf trace: list individual HLO ops (full name +
occurrences + self time) for a category or name substring.

Usage: python scripts/trace_drill.py <trace_dir> [name_substr] [topn]

Companion to perf_trace*.py — works offline from the saved .xplane.pb, no
TPU needed.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    trace_dir = sys.argv[1]
    substr = sys.argv[2] if len(sys.argv) > 2 else ""
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)

    def cells(r):
        return [c.get("v") if isinstance(c, dict) else c for c in r["c"]]

    # column layout matches perf_trace*.py: 2=category 3=name 6=occurrences
    # 9=total self us; later columns carry the HLO expression when present
    rows = []
    for r in d["rows"]:
        c = cells(r)
        category, name, n, selft = c[2], c[3], int(c[6]), float(c[9])
        if substr and substr not in name and substr not in category:
            continue
        expr = ""
        for col in c[10:]:
            if isinstance(col, str) and ("=" in col or "fusion" in col):
                expr = col
                break
        rows.append((selft, n, category, name, expr))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"matched {len(rows)} ops, total self us {tot:.0f} "
          f"(per step {tot/3/1000:.2f} ms over 3 steps)")
    for selft, n, category, name, expr in rows[:topn]:
        print(f"{selft/3/1000:8.3f} ms x{n:5d} {category[:18]:18s} {name}")
        if expr:
            print(f"          {expr[:200]}")


if __name__ == "__main__":
    main()
