#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [keys...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the sfDir tables
registered as views, sorts columns by name / rows by all columns, and
compares cell-by-cell. Mirrors TESTDATA.md: driver compares at sf0.01.
"""
import sys, os, json, glob, re, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# /*PAIRS*/ ... /*END_PAIRS*/ marks a shared sub-derivation the oracle
# author allows to be lifted into a TEMP TABLE. DuckDB re-inlines a CTE
# referenced from a recursive CTE into every unrolled round, so the
# components/cluster-rep/triangle oracles re-derive the full MinHash pair
# set ~log2(ids) times at sf1 (>30 min / 70 GB spill). Materializing the
# marked stage once makes the sf1 oracle arm finish; the driver's plain
# run still executes the inline form (the markers are inert comments).
# Same-text stages are materialized once and shared across oracles.
STAGE_RE = re.compile(r"/\*PAIRS\*/(.*?)/\*END_PAIRS\*/", re.S)
_stages = {}

def materialize_stages(con, sql):
    def lift(m):
        inner = m.group(1)
        key = hashlib.md5(inner.encode()).hexdigest()[:12]
        if key not in _stages:
            tbl = f"__stage_{key}"
            con.execute(f"CREATE TEMP TABLE {tbl} AS {inner}")
            _stages[key] = tbl
        return f"SELECT * FROM {_stages[key]}"
    return STAGE_RE.sub(lift, sql)

def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (ScaleSmoke sf1) = a dir
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = canon(con, f"SELECT * FROM '{pdir}/*.parquet'")
            want = canon(con, materialize_stages(con, oracle[name]))
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(got.columns)} oracle={list(want.columns)}"
        elif len(got) != len(want):
            results[name] = f"ROWCOUNT {len(got)} vs {len(want)}"
        else:
            eq = got.equals(want)
            if not eq:
                # find first differing cell for debugging
                diff = None
                for col in got.columns:
                    neq = got[col].astype(str) != want[col].astype(str)
                    if neq.any():
                        i = neq.idxmax()
                        diff = f"col={col} row={i} spark={got[col][i]!r} oracle={want[col][i]!r}"
                        break
                results[name] = f"VALUE-MISMATCH {diff}" if diff else "OK(str-eq)"
            else:
                results[name] = "OK"
    # queries with no oracle entry → rows-only check
    for pdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(pdir.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        n = con.sql(f"SELECT count(*) FROM '{pdir}/*.parquet'").fetchone()[0]
        results[name] = f"NO-ORACLE rows={n}" + ("" if n > 0 else " !! EMPTY")
    ok = sum(1 for v in results.values() if v.startswith(("OK", "NO-ORACLE rows=")) and "EMPTY" not in v)
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith(('OK','NO-ORACLE')) and 'EMPTY' not in v and 'MISMATCH' not in v else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} pass")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
