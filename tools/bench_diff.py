#!/usr/bin/env python
"""Bytes-first, min-sweep-second bench adjudication: diff two bench.py
artifacts.

Wall times at sf0.1 drift ±10-25% run-to-run on this rig (uniform,
machine-state; the r10 final record's own sweeps show 8x intra-query
spread with load ramping 0.03 -> 6.75 DURING the run) while per-query
shuffle-write bytes are deterministic. So regressions are judged in
this order (the r10 VERDICT protocol):

  1. BYTES — |delta| > max(0.5 MB, 15%) fails the gate (minus the
     documented EXPECTED_TRADES ceilings).
  2. MIN SWEEP — the quietest-rig wall each artifact ever saw for the
     query. A query whose MIN sweep regressed >1.3x (field-drift-
     adjusted) and >0.5s moved even when the rig was at its best —
     that is a real advisory, not weather.
  3. MEDIAN — only reported as the whole-run drift ratio so a uniform
     shift is visible at a glance; never used to flag a single query
     when min-sweep is available.

  python tools/bench_diff.py BENCH_local_r6.json BENCH_local_r7.json

Exits non-zero on byte REGRESSED movers only; wall findings stay
advisory (walls on a shared rig are evidence, not verdicts).
Artifacts without per-query ``sweeps`` (pre-r10) fall back to the
median ``queries`` walls for step 2.
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


def _walls(artifact: dict, use_sweeps: bool) -> dict[str, float]:
    """Quiet-rig wall per query: MIN over sweeps when ``use_sweeps``
    (r10+ artifacts), else the median ``queries`` value."""
    sweeps = artifact.get("sweeps")
    if use_sweeps and sweeps:
        return {k: min(v) for k, v in sweeps.items() if v}
    return dict(artifact.get("queries", {}))


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

    # comparing a MIN wall against a MEDIAN wall is biased by construction
    # (min < median); when only one artifact recorded sweeps, fall back to
    # median walls on BOTH sides and label the basis accordingly.
    both_sweeps = bool(old.get("sweeps")) and bool(new.get("sweeps"))
    ow = _walls(old, both_sweeps)
    nw = _walls(new, both_sweeps)
    if both_sweeps:
        wall_basis = "min-sweep"
        basis = ["old=min-sweep", "new=min-sweep"]
    else:
        wall_basis = "median"
        basis = ["median walls both sides"]
        if bool(old.get("sweeps")) != bool(new.get("sweeps")):
            basis.append("basis mismatch: one artifact lacks sweeps")
    ratios = [
        nw[k] / ow[k]
        for k in shared
        if ow.get(k, 0) > 0.05 and k in nw
    ]
    drift = statistics.median(ratios) if ratios else 1.0
    print(f"shared queries: {len(shared)}  median wall ratio: {drift:.2f} "
          f"[{', '.join(basis)}] "
          f"(uniform shift = machine drift, not a regression)")
    print(f"total shuffle MB: {sum(old['shuffle_mb'].values()):.0f} -> "
          f"{sum(new['shuffle_mb'].values()):.0f}")
    for art, tag in ((old, "old"), (new, "new")):
        ls = art.get("load_avg_start")
        # prefer the settled end sample (r11+): the raw end load includes
        # the bench's OWN 32-thread executors, so only the post-decay
        # sample isolates background contention.
        le = art.get("load_avg_end_settled") or art.get("load_avg_end")
        if ls and le and max(ls[0], le[0]) >= 2.0:
            settled = "settled " if "load_avg_end_settled" in art else ""
            print(f"LOAD warning ({tag}): rig not idle end-to-end "
                  f"(start {ls[0]:.2f}, {settled}end {le[0]:.2f}) — walls "
                  f"in this artifact are weather-contaminated; trust "
                  f"bytes/min-sweep")
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
        (k, ow[k], nw[k])
        for k in shared
        if k in nw and k in ow
        and nw[k] > 1.3 * drift * ow[k]
        and nw[k] - ow[k] > 0.5
        and all(k != m[0] for m in byte_movers)
    ]
    for k, o, n in advisories:
        print(f"WALL advisory ({wall_basis} wall moved with no byte move — "
              f"check order-coupling / standalone first): "
              f"{k}: {o:.2f}s -> {n:.2f}s")
    regressed = [
        m for m in byte_movers if m[2] > m[1] and m not in expected
    ]
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
