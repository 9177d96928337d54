"""Compare two bench.py outputs (e.g. sf0.1 vs sf1) and emit a growth
table: per-query ratio, sorted worst-first, with a verdict column.

A 10x data growth should cost <= ~10x wall time for linear operators;
sub-linear is common (fixed per-query session/plan overhead dominates at
toy scale).  Flag anything above ``--flag`` (default 12x, i.e. 10x data
plus 20% headroom) as superlinear.

Usage:
    python tools/scale_report.py BASE.json BIG.json [--scale 10] [--flag 12]

Prints a markdown table to stdout (paste into SCALE.md) and exits 1 if
any query exceeds the flag threshold, so it can double as a gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    # argparse (ADVICE r4): a dangling --flag or non-numeric value gets
    # a usage message instead of an IndexError/bare ValueError
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("base", help="bench JSON at the smaller scale")
    ap.add_argument("big", help="bench JSON at the larger scale")
    ap.add_argument("--scale", type=float, default=10.0,
                    help="data growth factor between the two runs")
    ap.add_argument("--flag", type=float, default=None,
                    help="ratio above which a query is flagged "
                         "(default: scale * 1.2)")
    ns = ap.parse_args()
    scale = ns.scale
    flag = ns.flag if ns.flag is not None else scale * 1.2

    base = json.load(open(ns.base))["queries"]
    big = json.load(open(ns.big))["queries"]

    rows = []
    for name in sorted(set(base) & set(big)):
        b, g = base[name], big[name]
        if b < 0 or g < 0:
            rows.append((float("inf"), name, b, g))
            continue
        rows.append((g / max(b, 1e-9), name, b, g))
    rows.sort(reverse=True)

    flagged = []
    print(f"| query | sf0.1 s | sf1 s | ratio (data x{scale:g}) | verdict |")
    print("|---|---|---|---|---|")
    for ratio, name, b, g in rows:
        if b < 0 or g < 0:
            flagged.append(name)
            print(f"| {name} | {b:.2f} | {g:.2f} | — | **FAIL** |")
            continue
        if ratio > flag:
            verdict = "**superlinear**"
            flagged.append(name)
        elif ratio > scale:
            verdict = "~linear (within headroom)"
        elif ratio > 2:
            verdict = "linear-or-better"
        else:
            verdict = "overhead-bound"
        print(f"| {name} | {b:.2f} | {g:.2f} | {ratio:.1f}x | {verdict} |")

    tb = sum(v for v in base.values() if v >= 0)
    tg = sum(v for v in big.values() if v >= 0)
    print(f"\ntotals: base {tb:.1f} s -> big {tg:.1f} s "
          f"({tg / max(tb, 1e-9):.2f}x for {scale:g}x data); "
          f"flagged: {flagged or 'none'}", file=sys.stderr)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
