"""Dump ``.explain("formatted")`` for suite queries to per-query text files.

Usage: python tools/dump_plans.py OUT_DIR [query_name ...]
(no names = every registered query).  Used to produce the
``plans/r15/<query>_{before,after}.txt`` evidence files."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as e
    from gcp_serverless_mapreduce_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = e.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:
            txt = f"ERROR building plan: {ex}\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
