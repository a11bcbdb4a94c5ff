#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run graft.Verify output against
DuckDB oracles on the same parquet tables, compare sorted rows exactly.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Driver-side tooling only — not part of the shipped library.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    out = [tuple(norm(r[i]) for i in order) for r in data]
    types = [str(rel.types[i]) for i in order]
    return sorted(cols), sorted(out, key=repr), types

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: spark output missing")
            n_fail += 1
            continue
        try:
            scols, srows, stypes = rows_of(con.sql(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"))
            ocols, orows, otypes = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif stypes != otypes:
            # The driver's hash is TYPE-sensitive (HUGEINT vs BIGINT,
            # decimal width) even when values are equal — the round-1
            # "int128 lesson". Fail locally on any type drift so the
            # local gate can never pass what the driver rejects.
            diffs = [f"{c}: spark={s} oracle={o}"
                     for c, s, o in zip(scols, stypes, otypes) if s != o]
            print(f"FAIL {name}: TYPE mismatch: {'; '.join(diffs)}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs (spark vs oracle):")
            for a, b in diffs:
                print(f"   {a}\n   {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    # queries without oracle: rows-only check
    for d in sorted(os.listdir(out_dir)):
        full = f"{out_dir}/{d}"
        if os.path.isdir(full) and d not in oracles:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{full}/*.parquet')").fetchone()[0]
                print(f"ROWS-ONLY {d}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"ROWS-ONLY {d}: unreadable: {str(e)[:200]}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
