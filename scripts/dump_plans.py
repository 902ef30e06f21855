"""Dump .explain("formatted") for every declared query (and the bm25 engine
paths) to plans/<outdir>/<query>_<tag>.txt — the optimization round's plan
evidence (guide §1: capture plan shape before/after each change).

Usage: python scripts/dump_plans.py <outdir> <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as e
    from information_retrieval_images_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="plan-dump")
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # pragma: no cover - diagnostic tool
            plan = f"ERROR: {ex}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
