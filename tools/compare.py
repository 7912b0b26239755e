#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query parquet under <verifyOutDir>/<name>/ with an entry in
oracle_sql.json: run the SQL in DuckDB over the sf tables, sort columns by
name on both sides, and compare the canonical STRING FORM of every value
row by row. The driver compares hashes of the pandas-loaded result, not
numeric equality (r11 q236: a value-level compare passed locally while the
driver's hash failed), so this mimic canonicalizes each cell to a
type-sensitive repr — integer widths normalize (int32 vs int64 hash equal
per the r4 observation), but int-vs-float, float-vs-Decimal, and any
Decimal exponent/trailing-zero representation difference FAIL here before
the driver sees them. Doubles must be bit-identical (repr of the same
binary64 is identical; repr of different ones never is).
"""
import json
import math
import sys
from decimal import Decimal

import duckdb


def canon(v):
    """Type-sensitive canonical string of one cell, mirroring a hash compare."""
    if v is None:
        return "None"
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, int):
        return repr(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return "float:" + repr(v)
    if isinstance(v, Decimal):
        # str keeps scale/exponent form: Decimal('1.50') != Decimal('1.5')
        return "Decimal:" + str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return type(v).__name__ + ":" + str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        # The driver's compare loads into pandas and sort_values()s — a
        # BLOB column arrives as bytearray cells, which pandas cannot hash
        # (r3 q77 failure). Reject binary output columns here so the local
        # harness catches it before the driver does.
        bin_cols = [c for c, t in zip(spark_rel.columns, spark_rel.types)
                    if str(t) == "BLOB"]
        if bin_cols:
            print(f"FAIL {name}: binary output columns {bin_cols} "
                  "(driver pandas compare cannot hash bytearray)")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        key = lambda r: tuple(map(canon, r))
        spark_rows = sorted(spark_rows, key=key)
        duck_rows = sorted(duck_rows, key=key)
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            if key(a) != key(b):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} duck={bad[2]}")
            n_fail += 1
            continue
        # Pandas-representation check, mirroring the driver's hash compare:
        # int32-vs-int64 width differences hash equal (values are equal
        # ints), but int-vs-float (r4 q81: DuckDB HUGEINT window sum →
        # float64) and exotic value classes like DECIMAL (r4 q77) hash
        # differently per reader. Flag any column where one side lands
        # float/object and the other doesn't.
        import pandas as pd  # noqa: F401 (driver env always has it)
        sdf = spark_rel.df()
        ddf = duck_rel.df()
        kinds = lambda df: {c: df[c].dtype.kind for c in df.columns}
        sk, dk = kinds(sdf), kinds(ddf)
        mixed = [c for c in sk
                 if (sk[c] in "fO") != (dk.get(c) in "fO")
                 or (sk[c] == "O") != (dk.get(c) == "O")]
        deci = [c for c in sdf.columns
                if sdf[c].dtype == object and any(
                    type(v).__name__ == "Decimal"
                    for v in sdf[c].dropna().head(3))]
        if mixed or deci:
            print(f"FAIL {name}: pandas dtype hazard mixed={mixed} "
                  f"decimal_obj={deci} spark={sk} duck={dk}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
