"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF and
compares against ``oracle_sql()`` via DuckDB: row count, column names,
and exact values (columns sorted by name, rows sorted by all columns).
Exact equality here is *stricter* than any order-insensitive hash the
driver could use — if this passes, the driver passes.

Usage: python tools/oracle_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bf = pd.to_numeric(b[c]).to_numpy(dtype=float)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at {i}: "
                    f"spark={af[i]!r} duck={bf[i]!r} delta={af[i]-bf[i]!r}"
                )
        else:
            eq = pd.Series(av).astype(object).where(pd.notna(av), None) == pd.Series(
                bv
            ).astype(object).where(pd.notna(bv), None)
            both_null = pd.Series(av).isna() & pd.Series(bv).isna()
            eq = eq | both_null
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from etl_mp_transactions_spark.session import get_spark

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(
                f"OK?  {name}: rows={len(spark_pdf)} (no oracle — rows-only)"
                f" [{time.time()-t0:.1f}s]"
            )
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems[:8]:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok; failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
