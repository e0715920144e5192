#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares: columns sorted by name, rows sorted,
values exactly equal. Exit code 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    result_dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(grows)} rows)"
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        if gcols != ecols:
            results[name] = f"SCHEMA-MISMATCH got={gcols} exp={ecols}"
        elif len(grows) != len(erows):
            results[name] = f"ROWCOUNT-MISMATCH got={len(grows)} exp={len(erows)}"
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows)) if a != b)
            results[name] = (f"VALUE-MISMATCH first at sorted row {bad}: "
                             f"got={grows[bad]} exp={erows[bad]}")
        else:
            results[name] = f"OK ({len(grows)} rows)"
    fails = 0
    for name in sorted(results):
        r = results[name]
        ok = r.startswith("OK") or r.startswith("rows-only")
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL':4} {name:28} {r}")
    # queries declared but with no result dir
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)):
            fails += 1
            print(f"FAIL {name:28} NO-RESULT-DIR")
    print(f"== {len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
