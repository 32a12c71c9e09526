#!/usr/bin/env python3
"""Build the BASELINE.md sf5.0 family table from sweep artifacts.

Usage: sweep50_table.py <sf5_full.json>... --base <sf01_full.json>...
Per row: median across sf5.0 passes, median across sf0.1 passes, ratio,
max steal_pct seen, flag when ratio > 50 (the 50x linear floor).
"""
import json
import sys


def med(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def load(paths):
    rows, steal, gc = {}, {}, {}
    for p in paths:
        d = json.load(open(p))
        for k, v in d["medians"].items():
            rows.setdefault(k, []).append(v)
            t = d.get("telemetry", {}).get(k, {})
            steal.setdefault(k, []).append(t.get("steal_pct", -1))
            gc.setdefault(k, []).append(t.get("gc_ms", -1))
    return rows, steal, gc


def main():
    argv = sys.argv[1:]
    i = argv.index("--base")
    big, bsteal, bgc = load(argv[:i])
    base, _, _ = load(argv[i + 1:])
    out = []
    for k in sorted(big):
        if k not in base:
            continue
        m5, m1 = med(big[k]), med(base[k])
        ratio = m5 / m1 if m1 > 0 else float("inf")
        out.append((ratio, k, m1, m5, max(bsteal[k]), max(bgc[k])))
    out.sort(reverse=True)
    print("| query | sf0.1 s | sf5.0 s | ratio | max steal | max gc_ms |")
    print("|---|---|---|---|---|---|")
    flagged = []
    for ratio, k, m1, m5, st, gc in out:
        mark = " **" if ratio > 50 else " "
        if ratio > 50:
            flagged.append(k)
        print("| %s | %.3f | %.3f |%s%.1fx%s | %.1f | %d |"
              % (k, m1, m5, mark, ratio, mark.strip() and "**" or "", st, gc))
    print()
    print("flagged (> 50x):", flagged if flagged else "none")


if __name__ == "__main__":
    main()
