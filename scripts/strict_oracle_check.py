"""Strict local mirror of the driver's correctness gate.

The driver compares Spark vs DuckDB results by sorting columns by name
and hashing the *rendered* values — so an int64 `9994` vs float64
`9994.0` mismatch even when numerically equal.  tests/test_oracle.py is
deliberately lenient (rtol=1e-5, check_dtype=False); this script is the
strict pre-flight: exact value equality AND matching dtype kind, so a
green run here predicts a green CORRECTNESS_r{N} hash.

Usage: python scripts/strict_oracle_check.py [query ...]
       (no args = every oracled query)
"""

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # DuckDB HUGEINT / decimal come back as object — surface them
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _render_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update(("|".join(repr(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(names):
    from schema_matching_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    targets = names or sorted(oracles)
    n_bad = 0
    for name in targets:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            a = _canon(queries[name](spark, SF_DIR).toPandas())
            e = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            n_bad += 1
            continue
        problems = []
        if sorted(a.columns) != sorted(e.columns):
            problems.append(f"cols {sorted(a.columns)} vs {sorted(e.columns)}")
        elif len(a) != len(e):
            problems.append(f"rows {len(a)} vs {len(e)}")
        else:
            for c in a.columns:
                ak, ek = a[c].dtype.kind, e[c].dtype.kind
                if ak != ek:
                    problems.append(f"dtype[{c}] {a[c].dtype} vs {e[c].dtype}")
            if not problems and _render_hash(a) != _render_hash(e):
                neq = (a != e) & ~(a.isna() & e.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                problems.append(f"value hash mismatch, differing cols={bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    problems.append(
                        f"  first diff {c}[{idx}]: {a[c][idx]!r} vs {e[c][idx]!r}"
                    )
        if problems:
            n_bad += 1
            print(f"{name}: FAIL " + "; ".join(problems))
        else:
            print(f"{name}: ok ({len(a)} rows)")
    print(f"\n{len(targets) - n_bad}/{len(targets)} strict-green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
