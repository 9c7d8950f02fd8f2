"""Local approximation of the driver's correctness harness.

Runs every queries() entry on a VANILLA SparkSession (Arrow conversion off,
like the driver's — this is what caught the round-1 int32/int64 drift) and
its oracle_sql() on DuckDB over the same parquet tables, then compares
row count / column names / a value hash after canonicalization (columns
sorted by name, floats rounded to 4dp, rows sorted by all columns).

Usage: python scripts/contract_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


def value_hash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.4f").encode()
    ).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    mod = load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            spdf = canon(fn(spark, sf_dir).toPandas())
            rec["spark_rows"] = len(spdf)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {type(e).__name__}: {e}"[:400]
            results[name] = rec
            print(f"{name}: ERR {rec['err'][:160]}")
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"{name}: rows={rec['spark_rows']} (no oracle)")
            continue
        try:
            odf = canon(con.sql(oracles[name]).df())
            rec["oracle_rows"] = len(odf)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"oracle: {type(e).__name__}: {e}"[:400]
            results[name] = rec
            print(f"{name}: ERR {rec['err'][:160]}")
            continue
        rec["rows_match"] = len(spdf) == len(odf)
        rec["schema_match"] = list(spdf.columns) == list(odf.columns)
        rec["hash_match"] = (
            rec["rows_match"]
            and rec["schema_match"]
            and value_hash(spdf) == value_hash(odf)
        )
        rec["secs"] = round(time.time() - t0, 2)
        results[name] = rec
        flag = "OK " if rec["hash_match"] else "FAIL"
        print(
            f"{name}: {flag} rows={rec['spark_rows']}/{rec['oracle_rows']} "
            f"schema={rec['schema_match']} {rec['secs']}s"
        )
        if not rec["hash_match"] and rec["rows_match"] and rec["schema_match"]:
            merged = spdf.compare(odf) if len(spdf) == len(odf) else None
            if merged is not None and len(merged):
                print(merged.head(5))
    bad = {k: v for k, v in results.items() if not v.get("hash_match")}
    print(json.dumps({k: v.get("err") or "mismatch" for k, v in bad.items()},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
