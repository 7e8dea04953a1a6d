"""Render the scaling-curve table from committed bench artifacts.

Reads two or three full-registry bench JSONs (sf0.1, sf1, sf10 —
each the one-line ``bench.py`` output format) and prints a markdown
table of per-query wall times and scale ratios, sorted by the
largest-scale ratio, plus the aggregate summary the README quotes.
Keeping this as a script (rather than hand-edited numbers) makes the
README table reproducible from the artifacts it cites.

Usage:
    python scripts/scaling_report.py BENCH_SF01 BENCH_SF1 [BENCH_SF10]
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    return d["queries"]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    scales = ["sf0.1", "sf1", "sf10"][: len(sys.argv) - 1]
    data = {s: load(p) for s, p in zip(scales, sys.argv[1:])}
    base = data["sf0.1"]
    common = [q for q in base if all(q in data[s] for s in scales)]
    top = scales[-1]
    growth = {"sf1": 10, "sf10": 100}

    def ratio(q: str, s: str) -> float | None:
        b = base.get(q, 0.0)
        return data[s][q] / b if b >= 0.1 else None

    rows = sorted(
        common,
        key=lambda q: -(ratio(q, top) or 0.0),
    )
    hdr = ["query", "sf0.1 s"] + [
        f"{s} s (x{growth[s]} data)" for s in scales[1:]
    ] + [f"{s}/sf0.1" for s in scales[1:]]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for q in rows:
        cells = [q, f"{base[q]:.2f}"]
        cells += [f"{data[s][q]:.2f}" for s in scales[1:]]
        for s in scales[1:]:
            r = ratio(q, s)
            cells.append(f"{r:.1f}x" if r is not None else "~0 base")
        print("| " + " | ".join(cells) + " |")

    print()
    for s in scales[1:]:
        tot_b = sum(base[q] for q in common)
        tot_s = sum(data[s][q] for q in common)
        rs = [r for q in common if (r := ratio(q, s)) is not None]
        med = sorted(rs)[len(rs) // 2]
        gm = math.exp(sum(math.log(r) for r in rs) / len(rs))
        print(
            f"{s}: total {tot_s:.1f}s vs sf0.1 {tot_b:.1f}s "
            f"({tot_s / tot_b:.2f}x wall on {growth[s]}x data); "
            f"median ratio {med:.2f}x, geomean {gm:.2f}x, "
            f"max {max(rs):.1f}x, n={len(rs)}"
        )
        # anything growing faster than the data is a scale bug;
        # call out queries whose ratio exceeds the data growth
        over = [q for q in common if (ratio(q, s) or 0) > growth[s]]
        print(f"{s}: super-linear (ratio > {growth[s]}x): {over or 'none'}")


if __name__ == "__main__":
    main()
