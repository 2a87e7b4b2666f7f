#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same test tables and compare row count, schema width, and a hash of the
column-name-sorted values. Usage:

    python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # full precision: the engines are expected to be BIT-identical,
        # not merely close — a 1-ulp drift is a real finding here
        return f"{v:.17g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()


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
            res = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_names = [d[0] for d in res.description]
            s_rows = res.fetchall()
        except Exception as e:
            results[name] = {"error": f"spark result missing: {e}"}
            continue
        try:
            ores = con.execute(sql)
            o_names = [d[0] for d in ores.description]
            o_rows = ores.fetchall()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {str(e)[:300]}"}
            continue
        # the DRIVER's comparator sorts cell values with pandas, which
        # raises on array/struct/map cells — reject them here so a query
        # that would fail the real gate also fails this replica
        complex_cell = next(
            (v for rows in (s_rows[:1], o_rows[:1]) for row in rows
             for v in row if isinstance(v, (list, tuple, dict, set))),
            None)
        if complex_cell is not None:
            results[name] = {"error":
                "complex-typed column (driver comparator cannot sort "
                f"arrays): {str(complex_cell)[:80]}"}
            continue
        entry["rows_match"] = len(s_rows) == len(o_rows)
        entry["schema_match"] = sorted(s_names) == sorted(o_names)
        entry["hash_match"] = (entry["schema_match"]
                               and table_hash(s_rows, s_names) == table_hash(o_rows, o_names))
        entry["n_spark"], entry["n_oracle"] = len(s_rows), len(o_rows)
        if not entry["hash_match"]:
            entry["spark_cols"], entry["oracle_cols"] = s_names, o_names
            # first differing row (after column sort) for debugging
            so = sorted(range(len(s_names)), key=lambda i: s_names[i])
            oo = sorted(range(len(o_names)), key=lambda i: o_names[i])
            if entry["schema_match"]:
                for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
                    a = [norm(sr[j]) for j in so]
                    b = [norm(orr[j]) for j in oo]
                    if a != b:
                        entry["first_diff"] = {"row": i, "spark": a[:8], "oracle": b[:8]}
                        break
        results[name] = entry
    ok = sum(1 for e in results.values() if e.get("hash_match"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {ok}/{len(results)} hash-match ==", file=sys.stderr)
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
