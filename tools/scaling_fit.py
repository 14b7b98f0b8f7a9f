"""Cross-SF scaling fit (VERDICT r9 item 3): least-squares exponent per
headline query over every same-round bench record found, t ≈ a·SF^b in
log-log space.  b ≈ 1 is linear data-dominated scaling; b ≪ 1 means the
query is still fixed-cost-dominated at these tiers (per-query overhead,
planning, JVM warm-up); b > 1 is the smell of superlinear work (sort
pressure, pair expansion) and gets flagged.

    python tools/scaling_fit.py BENCH_sf0.01_r10.json BENCH_r10_probe.json \
        BENCH_sf1_r10.json BENCH_sf10_r10.json

Each argument must be a bench JSON record carrying {"sf": N, "queries":
{...}}.  Output: a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import math
import sys


def fit(points: list[tuple[float, float]]) -> float:
    """OLS slope of log10(t) on log10(sf)."""
    xs = [math.log10(sf) for sf, _ in points]
    ys = [math.log10(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    recs = []
    for path in sys.argv[1:]:
        r = json.load(open(path))
        if r.get("sf") is None or "queries" not in r:
            print(f"skipping {path}: no sf/queries", file=sys.stderr)
            continue
        recs.append((float(r["sf"]), r["queries"], path))
    recs.sort()
    if len(recs) < 2:
        print("need >=2 records", file=sys.stderr)
        sys.exit(1)
    names = [q for q in recs[0][1] if all(q in r[1] for r in recs)]
    sfs = [r[0] for r in recs]
    print(f"| query | " + " | ".join(f"sf{sf:g} (s)" for sf in sfs)
          + " | exponent b |")
    print("|---|" + "---|" * (len(sfs) + 1))
    def _num(v) -> float | None:
        # bench records can hold None / 0 / 'FAILED: ...' strings (the
        # sf10 probe writes them for OOM'd ops) — only positive numbers
        # are fit points or printable cells (ADVICE r10 item 3)
        return v if isinstance(v, (int, float)) and v > 0 else None

    for q in names:
        pts = [(r[0], _num(r[1][q])) for r in recs]
        pts = [(sf, t) for sf, t in pts if t is not None]
        if len(pts) < 2:
            continue
        b = fit(pts)
        flag = " **superlinear**" if b > 1.15 else ""
        cells = " | ".join(
            f"{_num(r[1][q]):.2f}" if _num(r[1][q]) is not None else "-"
            for r in recs
        )
        print(f"| {q} | {cells} | {b:.2f}{flag} |")


if __name__ == "__main__":
    main()
