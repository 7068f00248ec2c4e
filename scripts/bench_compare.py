#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (e.g. across rounds).

Usage: python3 scripts/bench_compare.py BENCH_old.json BENCH_new.json
Accepts raw files containing the one-line JSON anywhere in them.
"""
import json, re, sys


def load(path):
    text = open(path).read()
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        raise SystemExit(f"no bench JSON found in {path}")
    return json.loads(m.group(0))


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s)")
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            rows.append((b, f"  NEW  {name}: {b:.2f}s"))
        elif b is None:
            rows.append((0, f"  GONE {name} (was {a:.2f}s)"))
        else:
            d = b - a
            if abs(d) >= 0.3:
                rows.append((abs(d), f"  {'+' if d > 0 else '-'}{abs(d):4.1f}s {name}: {a:.2f} -> {b:.2f}"))
    for _, line in sorted(rows, reverse=True):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
