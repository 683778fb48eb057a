"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <before|after> <query> [query ...]
       python tools/dump_plans.py <tag> <before|after> --all
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from global_stock_data_warehouse_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gsdw-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if names == ["--all"]:
        names = list(qs)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
