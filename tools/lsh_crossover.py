"""Measure the embedding_neardup_lsh layout-dispatch crossover.

The candidate-row layout is dispatched on EXPECTED CANDIDATE BYTES
(``carry_max_bytes``): below the cap, vectors ride the candidate join
(two fetch joins saved); above it, candidates shrink to (id_a, id_b) and
vectors are fetched after dedup. r7 set the cap at 4 MiB from the 100x
shuffle blowup (27 GB carried vs 1.2 GB narrow) without measuring where
the WALL crossover sits — and the sf0.1 bench query (2k vectors,
expected ~136 MB candidate bytes -> narrow) regressed 1.6 -> 3.4 s.

This harness sweeps corpus size x layout, recording warm wall and
shuffle-write bytes per run, so the default cap is data-derived:

    python tools/lsh_crossover.py            # writes LSH_CROSSOVER.json

Reading the result: pick the largest cap where the carried layout still
wins (or ties) wall while its shuffle bytes stay within what one
executor comfortably spills — the narrow layout's bytes are ~flat, so
the cap bounds the worst-case regression the dispatch can choose.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sys.path.insert(0, os.path.join(REPO, "tools"))
from scale_slope import gen_cvecs, get_spark, shuffle_write_bytes  # noqa: E402

from global_stock_data_warehouse_spark.operators.similarity import (  # noqa: E402
    _derive_lsh_params,
    embedding_neardup_lsh,
)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for scale in (1, 2, 4, 8, 16, 32):
        n = 2000 * scale
        corpus = gen_cvecs(spark, n).localCheckpoint(eager=True)
        planes, tables = _derive_lsh_params(n, 0.8)
        exp_pairs = tables * n * n / float(1 << min(planes, 62))
        exp_bytes = int(exp_pairs * 2 * (16 + 4 * 16))
        for carry in (True, False):
            walls = []
            rows = sb = None
            for rep in range(3):
                sb0 = shuffle_write_bytes(spark)
                t0 = time.time()
                rows = embedding_neardup_lsh(
                    corpus, threshold=0.8, dim=16, carry_vectors=carry
                ).count()
                walls.append(round(time.time() - t0, 3))
                sb = shuffle_write_bytes(spark) - sb0
            rec = {
                "n": n, "planes": planes, "tables": tables,
                "expected_candidate_bytes": exp_bytes, "carry": carry,
                "rows": rows, "wall_warm_s": min(walls[1:]),
                "walls": walls, "shuffle_mb": round(sb / 1e6, 2),
            }
            out.append(rec)
            print(json.dumps(rec))
    with open(os.path.join(REPO, "LSH_CROSSOVER.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
