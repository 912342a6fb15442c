#!/usr/bin/env python
"""Convert benchmark JSON lines to CSV (reference scripts/parse_results.py)."""

import csv
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_results.json"
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        return
    keys = sorted({k for r in rows for k in r})
    w = csv.DictWriter(sys.stdout, fieldnames=keys)
    w.writeheader()
    w.writerows(rows)


if __name__ == "__main__":
    main()
