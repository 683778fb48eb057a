#!/usr/bin/env python
"""Bytes-first bench adjudication: diff two bench.py artifacts.

Wall times at sf0.1 drift ±10-25% run-to-run on this rig (uniform,
machine-state) while per-query shuffle-write bytes are deterministic —
so regressions are judged on BYTES first, and on walls only when a
SINGLE query moves against a flat field. This tool encodes that recipe:

  python tools/bench_diff.py BENCH_local_r6.json BENCH_local_r7.json

Prints (and exits non-zero on) BYTE movers: |delta| > max(0.5 MB, 15%).
Wall movers (>1.3x and >0.5s) are listed as advisory only, with the
whole-run drift ratio so a uniform shift is visible at a glance.
"""

from __future__ import annotations

import json
import statistics
import sys

# Deliberate, measured byte trades: a byte GROWTH on these queries up to
# the recorded ceiling is a documented design choice, not a regression —
# the gate prints it as EXPECTED and does not fail. Keep this list short
# and each entry backed by an artifact.
EXPECTED_TRADES = {
    # r8: tools/lsh_crossover.py swept n=2k..32k and set a 256 MiB
    # carried-layout cap (LSH_CROSSOVER.json); at sf0.1 the carried
    # layout spends ~47 MB of shuffle to buy wall 3.44s -> 1.63s. Any
    # old artifact predating r8 (narrow layout, ~1 MB) will show this
    # move; it is the measured crossover, not drift.
    "embedding_neardup_lsh": {
        "max_mb": 60.0,
        "reason": "r8 measured LSH carry crossover (LSH_CROSSOVER.json): "
                  "+46MB shuffle bought wall 3.44->1.63s at sf0.1",
    },
}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    shared = sorted(set(old["shuffle_mb"]) & set(new["shuffle_mb"]))
    byte_movers = []
    for k in shared:
        o, n = old["shuffle_mb"][k], new["shuffle_mb"][k]
        if abs(n - o) > max(0.5, 0.15 * o):
            byte_movers.append((k, o, n))
    ratios = [
        new["queries"][k] / old["queries"][k]
        for k in shared
        if old["queries"].get(k, 0) > 0.05 and k in new["queries"]
    ]
    drift = statistics.median(ratios) if ratios else 1.0
    print(f"shared queries: {len(shared)}  median wall ratio: {drift:.2f} "
          f"(uniform shift = machine drift, not a regression)")
    print(f"total shuffle MB: {sum(old['shuffle_mb'].values()):.0f} -> "
          f"{sum(new['shuffle_mb'].values()):.0f}")
    expected = []
    for k, o, n in sorted(byte_movers, key=lambda t: t[1] - t[2]):
        trade = EXPECTED_TRADES.get(k)
        if n > o and trade and n <= trade["max_mb"]:
            expected.append((k, o, n))
            print(f"BYTES EXPECTED  {k}: {o:.2f} -> {n:.2f} MB "
                  f"({trade['reason']})")
            continue
        tag = "IMPROVED" if n < o else "REGRESSED"
        print(f"BYTES {tag:9s} {k}: {o:.2f} -> {n:.2f} MB")
    advisories = [
        (k, old["queries"][k], new["queries"][k])
        for k in shared
        if k in new["queries"]
        and new["queries"][k] > 1.3 * drift * old["queries"][k]
        and new["queries"][k] - old["queries"][k] > 0.5
        and all(k != m[0] for m in byte_movers)
    ]
    for k, o, n in advisories:
        print(f"WALL advisory (no byte move — check order-coupling / "
              f"standalone first): {k}: {o:.2f}s -> {n:.2f}s")
    regressed = [
        m for m in byte_movers if m[2] > m[1] and m not in expected
    ]
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
