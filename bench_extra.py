"""Extra benchmarks (guide §1.4): per-operator isolation with the noop
sink, repeat timing, and .explain('formatted') capture.

NOT part of the driver contract — bench.py is the frozen measurement
instrument; this file exists so optimization work can time one operator
at a time (fresh or shared session), label jobs, and dump physical plans
to plans/r06/.

Usage:
  python bench_extra.py op1 op2 ...     # time listed queries() entries
  python bench_extra.py --plans op ...  # also write plans/r06/<op>_<tag>.txt
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, REPS (default 3),
       PLAN_TAG (default 'before')
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))
PLAN_TAG = os.environ.get("PLAN_TAG", "before")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plans = "--plans" in sys.argv

    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    results: dict[str, list[float]] = {}
    for name in args:
        fn = qs[name]
        times = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times}", flush=True)
        if do_plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/r06/{name}_{PLAN_TAG}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"  plan -> plans/r06/{name}_{PLAN_TAG}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
