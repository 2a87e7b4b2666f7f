#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same test tables and compare row count, schema width, and a hash of the
column-name-sorted values.

FAITHFUL TO THE DRIVER: both sides go through pandas (the Spark parquet via
pyarrow -> pandas, the oracle via duckdb .fetchdf()), because that is the
path the driver's comparator takes. This is what makes DuckDB type widening
visible locally: a HUGEINT `sum()` or a DECIMAL(38,0) output lands in the
pandas frame as float64/object-Decimal and hashes as "2000.0"/"Decimal"
while Spark's int64 parquet column hashes as "2000". fetchall() (the old
path here) hid exactly that class of mismatch — 9 queries shipped red in
round 9 while this script showed 216/216 green.

Usage:

    python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # pandas cells: numpy scalars, NaN/NaT, Decimal objects, datetimes
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        # match the old semantics: true NULL -> "NULL"; a float NaN from a
        # widened integer column is indistinguishable from NULL in pandas,
        # which is itself a faithful reproduction of the driver's view
        return "NULL" if v is None or v is pd.NaT else "NaN"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f != f:
            return "NaN"
        # str(), NOT "%.17g": shortest round-trip repr is still unique per
        # bit pattern (two doubles differing by 1 ulp stringify apart) but
        # KEEPS the trailing ".0" — "%.17g" renders float64 2000.0 as
        # "2000", silently matching an int64 2000 on the other side and
        # hiding exactly the DuckDB HUGEINT/DECIMAL widening this script
        # exists to reproduce
        return str(f)
    if isinstance(v, (np.bool_, bool)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def frame_cells(df):
    """Rows of normalized strings, columns sorted by name (driver order)."""
    cols = sorted(df.columns)
    sub = df[cols]
    return [[norm(v) for v in row] for row in sub.itertuples(index=False)]


def table_hash(rows):
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def read_spark(con, out_dir, name):
    # through DuckDB -> fetchdf, NOT pd.read_parquet: the driver reads the
    # Spark result the same way, so e.g. a date32 column lands as
    # datetime64 ("2024-01-01 00:00:00") on BOTH sides rather than as a
    # python date ("2024-01-01") on one — events_cohort passes the real
    # gate only because of this symmetry
    parts = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not parts:
        raise FileNotFoundError(f"{out_dir}/{name}/*.parquet")
    return con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        entry = {}
        try:
            sdf = read_spark(con, out_dir, name)
        except Exception as e:
            results[name] = {"error": f"spark result missing: {e}"}
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {str(e)[:300]}"}
            continue
        # the driver's comparator sorts cell values with pandas, which
        # raises on array/struct/map cells — reject them here so a query
        # that would fail the real gate also fails this replica
        complex_cell = None
        for df in (sdf, odf):
            if len(df) and complex_cell is None:
                for v in df.iloc[0]:
                    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                        complex_cell = v
                        break
        if complex_cell is not None:
            results[name] = {"error":
                "complex-typed column (driver comparator cannot sort "
                f"arrays): {str(complex_cell)[:80]}"}
            continue
        entry["rows_match"] = len(sdf) == len(odf)
        entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        s_rows = frame_cells(sdf)
        o_rows = frame_cells(odf)
        entry["hash_match"] = (entry["schema_match"]
                               and table_hash(s_rows) == table_hash(o_rows))
        entry["n_spark"], entry["n_oracle"] = len(sdf), len(odf)
        if not entry["hash_match"]:
            entry["spark_cols"] = list(sdf.columns)
            entry["oracle_cols"] = list(odf.columns)
            if entry["schema_match"]:
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    if a != b:
                        entry["first_diff"] = {"row": i, "spark": a[:8],
                                               "oracle": b[:8]}
                        break
        results[name] = entry
    ok = sum(1 for e in results.values() if e.get("hash_match"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {ok}/{len(results)} hash-match ==", file=sys.stderr)
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
