"""Dtype-drift audit: for every entry, compare the pandas dtype of each
column of the Spark result vs the DuckDB oracle result. The local value
hash normalizes 3.0 == 3, the driver's does NOT (the round-2
w6_para_merge lesson) — so int-vs-float drift is a silent driver risk
even when the local hash passes.

Usage: python tools/audit_dtypes.py [sf_dir]
"""
from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind(dtype) -> str:
    k = dtype.kind  # i/u -> int, f -> float, O -> object, M -> datetime
    return {"i": "int", "u": "int", "f": "float", "O": "obj",
            "M": "ts", "b": "bool"}.get(k, k)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from pdf_to_opensearch_spark.session import get_spark

    spark = get_spark("audit_dtypes", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
            du = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR] {name}: {exc}")
            bad += 1
            continue
        drift = []
        for col in sorted(set(sp.columns) & set(du.columns)):
            ks, kd = kind(sp[col].dtype), kind(du[col].dtype)
            # nullable int comes back float64 in pandas when NULLs exist —
            # flag only int-vs-float drift with no NULLs to excuse it
            if ks != kd and not (
                    {ks, kd} == {"int", "float"}
                    and (sp[col].isna().any() or du[col].isna().any())):
                drift.append(f"{col}: spark={ks} duckdb={kd}")
        if drift:
            bad += 1
            print(f"[DRIFT] {name}: {'; '.join(drift)}")
        else:
            print(f"[ok] {name}")
    print(f"done, {bad} flagged")


if __name__ == "__main__":
    main()
