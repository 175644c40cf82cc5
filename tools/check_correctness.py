"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count, column names, and exact values
(rows sorted, columns sorted by name).

``--strict`` additionally replays the driver's dtype-SENSITIVE pandas
value-hash: float64-vs-int64 divergence (e.g. DuckDB typing a bare
SUM(int) as HUGEINT → float64) fails here even when the values
compare equal — the round-1 failure mode this tool originally missed.
Integer-width differences (int32 vs int64) hash identically and pass.

Usage: python tools/check_correctness.py [--strict] [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
                continue
            except (ValueError, TypeError):
                pass
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def strict_hash(pdf: pd.DataFrame) -> int:
    """Dtype-sensitive value hash in the driver's style: columns
    sorted by name, rows sorted, pandas object-hash summed."""
    s = pdf[sorted(pdf.columns)]
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(s, index=False).sum())


def main() -> int:
    import __spark_entry__ as e
    from facs_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(cpus=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw_got = fn(spark, sf_dir).toPandas()
            got = normalize(raw_got)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            raw_want = con.execute(oracles[name]).df()
            want = normalize(raw_want)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = []
        if strict and len(raw_got) == len(raw_want) \
                and sorted(raw_got.columns) == sorted(raw_want.columns):
            if strict_hash(raw_got) != strict_hash(raw_want):
                problems.append(
                    "strict value-hash mismatch (dtype-sensitive): "
                    + str({c: str(raw_got[sorted(raw_got.columns)]
                                  .dtypes[i]) for i, c in
                           enumerate(sorted(raw_got.columns))})
                    + " vs "
                    + str({c: str(raw_want[sorted(raw_want.columns)]
                                  .dtypes[i]) for i, c in
                           enumerate(sorted(raw_want.columns))}))
        if len(got) != len(want):
            problems.append(f"rowcount {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} != {list(want.columns)}")
        if not problems:
            for c in got.columns:
                bad = [i for i in range(len(got))
                       if not values_equal(got[c].iloc[i], want[c].iloc[i])]
                if bad:
                    i = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} mismatches, first at row {i}: "
                        f"{got[c].iloc[i]!r} != {want[c].iloc[i]!r}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(got)} [{dt:.1f}s]")
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
