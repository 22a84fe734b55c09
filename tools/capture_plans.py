"""Capture .explain('formatted') for named queries() entries into
plans/r06/<name>_<tag>.txt (judge evidence for OPTIMIZATION_r06.md).

Usage: python tools/capture_plans.py <tag> <name> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entry
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark("capture_plans", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r06", exist_ok=True)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
