#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run graft.Verify output against
DuckDB oracles on the same parquet tables, compare sorted rows exactly.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Driver-side tooling only — not part of the shipped library.
"""
import sys, os, json, math, re
import duckdb

# Round-11 lesson: the driver's DuckDB build and the local one disagree on
# the last ulp of libm transcendentals (ln/pow/exp/log — NOT IEEE-correctly-
# rounded, unlike + - * / sqrt), so a DOUBLE column produced through a
# transcendental and then pinned with floor(x*1e6...) can flip its floored
# digit on the driver even though it passes here. The local gate cannot see
# that divergence by comparing values (both engines here are the same
# build), so it LINTS for the pattern instead: a DOUBLE column in the final
# schema + a floor(...*1eN...) pin whose ARGUMENT contains a transcendental
# call. sqrt and / are IEEE-correctly-rounded and stay allowed — three of
# the four round-11 reds used only those and failed on boundary-value luck
# (a floored digit landing a hair from an integer), which no static lint
# can see; those were fixed in round 12 by removing doubles from their
# lineage entirely (integer/DECIMAL emission).
#
# RATCHET, not purge: queries whose transcendental argument domain is
# data-dependent (bm25's ln over df ratios, entropy, PMI, ...) CANNOT use
# the ndcg literal-table cure — a 9dp floor-pin immediately on the ln is
# the best engine-portable form that exists, and the queries below have
# held green across every driver run to date. They are grandfathered by
# name; any NEW query matching the pattern fails the gate and must either
# use a literal table (bounded domain) or integer/DECIMAL sufficient
# statistics (see RankStatsQueries round-12 notes).
TRANSCENDENTAL = re.compile(r"\b(ln|pow|power|exp|log|log2|log10)\s*\(",
                            re.IGNORECASE)
FLOOR_OPEN = re.compile(r"\bfloor\s*\(", re.IGNORECASE)
PIN_SCALE = re.compile(r"\*\s*10{6,9}")

LINT_GRANDFATHERED = {
    "q_benford", "q_bm25_topk", "q_cluster_terms", "q_ddsketch_quantiles",
    "q_dict_encoding", "q_dp_counts", "q_dsir_weights", "q_hybrid_rrf",
    "q_kl_divergence", "q_link_prediction", "q_lm_perplexity",
    "q_mutual_info", "q_nb_calibration", "q_nb_score", "q_nb_train",
    "q_psi_drift", "q_record_linkage", "q_survival_km", "q_text_entropy",
    "q_tfidf_top_terms", "q_time_decay", "q_token_pmi", "q_ucb_bandit",
    "q_zipf_fit",
}

def _floor_args(sql):
    """Yield the balanced-paren argument text of every floor(...) call."""
    for m in FLOOR_OPEN.finditer(sql):
        depth, start = 1, m.end()
        i = start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield sql[start:i - 1]

# Round-12 lesson: the driver's hash gate cannot faithfully hash top-level
# DECIMAL result columns (pandas/pyarrow Decimal objects hash/sort
# differently from DuckDB's conversion even when values are equal), and its
# pandas row-sorter CRASHES on ARRAY/LIST columns ("unhashable type:
# numpy.ndarray" — q_ivf_upsert, r12). Across all 297 r12 outputs the ONLY
# emitters of either type were exactly the four driver-reds. The rule is
# therefore absolute, with NO grandfather list: the final schema of every
# query must stay inside the driver-proven scalar set (BIGINT/INT, DOUBLE,
# VARCHAR, DATE, TIMESTAMP, BOOLEAN). DECIMALs and arrays are fine INSIDE
# a plan — re-emit as scaled BIGINT, exact-integer VARCHAR, or exploded
# scalar rows (array_join for display strings). Mirrored at build time by
# EmissionSurfaceSpec.
BANNED_EMISSION = re.compile(r"DECIMAL|\[\]|^LIST|STRUCT|MAP|HUGEINT|UHUGEINT",
                             re.IGNORECASE)

def lint_emission_surface(cols, types):
    bad = [f"{c}: {t}" for c, t in zip(cols, types)
           if BANNED_EMISSION.search(t)]
    if bad:
        return (f"LINT: driver-unhashable top-level column type(s) "
                f"[{'; '.join(bad)}] — the driver gate cannot hash DECIMAL "
                f"and crashes on ARRAY/LIST (round-12 root cause); emit "
                f"scaled BIGINT / exact-integer VARCHAR / exploded scalar "
                f"rows instead")
    return None

def lint_build_sensitive_double(sql, cols, types):
    dbl_cols = [c for c, t in zip(cols, types) if t == "DOUBLE"]
    if not dbl_cols:
        return None
    for arg in _floor_args(sql):
        if TRANSCENDENTAL.search(arg) and PIN_SCALE.search(arg):
            return (f"LINT: DOUBLE column(s) {dbl_cols} and a floor(*1eN) "
                    f"pin directly over a transcendental (ln/pow/exp/log) — "
                    f"build-sensitive on the driver; use a literal table "
                    f"(bounded domain) or integer/DECIMAL sufficient "
                    f"statistics (see RankStatsQueries round-12 notes)")
    return None

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
        surface = lint_emission_surface(scols, stypes)
        if surface:
            print(f"FAIL {name}: {surface}")
            n_fail += 1
        elif scols != ocols:
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
            lint = lint_build_sensitive_double(sql, ocols, otypes)
            if lint and name not in LINT_GRANDFATHERED:
                print(f"FAIL {name}: {lint}")
                n_fail += 1
            elif lint:
                print(f"PASS {name} ({len(srows)} rows) "
                      f"[lint-grandfathered pinned transcendental]")
                n_pass += 1
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
