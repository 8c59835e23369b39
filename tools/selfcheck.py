#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views
named after the harness tables, and compares: column names (sorted),
dtypes (loose), and cell values after sorting rows by all columns.

Additionally enforces the driver-comparer type contract (learned from
CORRECTNESS_r01: every DECIMAL-output query hash-failed, an array column
crashed the comparer): the Spark parquet read via pyarrow must contain no
decimal.Decimal and no ndarray/list cells, and the oracle SQL must not
produce DECIMAL-typed columns (duckdb .df() silently floats them, the
driver's normalization may not).
"""
import decimal
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def type_leaks(path):
    """Driver-comparer contract scan on the Spark parquet SCHEMA (complete,
    unlike value sampling): decimal columns surface as decimal.Decimal
    cells and nested types as ndarray/dict cells in pandas readers, both
    of which poison the driver's sort+hash."""
    import glob
    import pyarrow.parquet as pq
    import pyarrow.types as pt
    for f in glob.glob(f"{path}/*.parquet"):
        for field in pq.read_schema(f):
            t = field.type
            if pt.is_decimal(t):
                return f"column {field.name} is {t}"
            if (pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t)
                    or pt.is_struct(t) or pt.is_map(t)):
                return f"column {field.name} is nested ({t})"
    return None


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    # pandas NaN/NaT
    try:
        import pandas as pd
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Denominator guard (round-8 postmortem: queries that threw at dump time
    # vanished from correctness instead of failing). Every oracle entry must
    # have a dump dir, and any query Verify recorded as failed is a FAIL here.
    import os
    try:
        verr = json.load(open(f"{out_dir}/verify_errors.json"))
    except FileNotFoundError:
        verr = {}
    for name, msg in sorted(verr.items()):
        if only and name not in only:
            continue
        print(f"FAIL {name}: verify dump error: {msg}")
        n_fail += 1
    missing_dirs = [n for n in sorted(oracle) if (not only or n in only)
                    and n not in verr
                    and not os.path.isdir(f"{out_dir}/{n}")]
    for name in missing_dirs:
        print(f"FAIL {name}: no dump dir (query silently skipped?)")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in verr or name in missing_dirs:
            continue  # already reported above
        try:
            rel = con.sql(sql)
            dec_cols = [c for c, t in zip(rel.columns, rel.types)
                        if "DECIMAL" in str(t).upper()]
            if dec_cols:
                print(f"FAIL {name}: oracle emits DECIMAL columns {dec_cols}")
                n_fail += 1
                continue
            leak = type_leaks(f"{out_dir}/{name}")
            if leak:
                print(f"FAIL {name}: spark output type leak: {leak}")
                n_fail += 1
                continue
            spark_df = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            duck_df = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        sc, dc = list(spark_df.columns), list(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rowcount spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for col in sc:
            av, bv = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (a, b) in enumerate(zip(av, bv)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: first diff col={col} row={i} spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            ts = {c: str(spark_df[c].dtype) for c in sc}
            td = {c: str(duck_df[c].dtype) for c in dc}
            warn = {c: (ts[c], td[c]) for c in sc if ts[c] != td[c]}
            note = f" [dtype-warn {warn}]" if warn else ""
            print(f"PASS {name} rows={len(spark_df)}{note}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
