"""Local twin of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v) -> str:
    import datetime as dt
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        # length-prefixed elements: an unescaped "," join would hash
        # ['a,b'] and ['a','b'] identically (review r12)
        return "[" + ",".join(f"{len(c)}:{c}"
                              for c in (norm_cell(x) for x in v)) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive multiset hash. Cells are LENGTH-PREFIXED
    before joining (review r12): with a bare "|" join, rows
    ('a|b','c') and ('a','b|c') — or a newline inside a string cell —
    serialized identically and a real divergence could hash OK."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(f"{len(c)}:{c}"
                 for c in (norm_cell(r[i]) for i in order))
        for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import icelake_spark
    from icelake_spark.queries import oracle_sql, queries

    spark = icelake_spark.default_session("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = queries(), oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must FAIL, not silently check nothing (r12)
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        # --- driver-mimic lint (continues below after basic checks): the driver canonicalizes via pandas, so
        # (a) DuckDB HUGEINT columns become float64 and hash-mismatch
        #     Spark bigints even when values are identical;
        # (b) list/array-typed output columns crash its sort_values
        #     canonicalizer (unhashable type: 'list').
        # fetchall() above hides both, so flag them explicitly.
        try:
            import pandas as _pd
            # LIMIT 0 still carries DuckDB's type→pandas dtype mapping
            # (HUGEINT→float64), without re-running the heavy query
            odf = con.execute(
                f"SELECT * FROM ({oracles[name]}) __lint LIMIT 0").df()
            for cn in odf.columns:
                i = ocols.index(cn)
                vals = [r[i] for r in orows]
                # nullable ints become float64 on BOTH sides (pandas), so
                # only flag all-int no-null columns — those stay int64
                # unless DuckDB returned HUGEINT
                if (odf[cn].dtype == "float64" and vals
                        and all(isinstance(v, int) and not isinstance(v, bool)
                                for v in vals)):
                    problems.append(
                        f"driver-lint: oracle col {cn} is int via fetchall but "
                        f"float64 via pandas (DuckDB HUGEINT?) — CAST AS BIGINT")
            for rows_, cols_, side in ((srows, scols, "spark"),
                                       (orows, ocols, "oracle")):
                for r in rows_[:5]:
                    for cn, v in zip(cols_, r):
                        if isinstance(v, (list, tuple)):
                            problems.append(
                                f"driver-lint: {side} col {cn} is array-typed — "
                                f"flatten/stringify for the driver canonicalizer")
        except Exception as e:  # lint must never mask the real check
            problems.append(f"driver-lint error: {str(e)[:120]}")
        problems = list(dict.fromkeys(problems))
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # first differing line for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark:  {a[:160]}")
                        problems.append(f"  duckdb: {b[:160]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
