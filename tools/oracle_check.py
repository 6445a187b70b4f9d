#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query...]
       python3 tools/oracle_check.py <verify_out_dir> <sf_dir> --json <path> [query...]

With --json, additionally writes the driver's CORRECTNESS artifact
shape — {name: {rows_match, schema_match, hash_match, err}} — to
<path>, flushed incrementally after EVERY query so a crash or timeout
partway still leaves the completed entries on disk (round 12 shipped
an empty driver artifact; the committed self-run is the backstop).

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir
parquet tables, sorts columns by name and rows by value, and compares.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we normalise tiny FP noise for
        # diagnostics but flag anything that differs beyond 1e-9
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    key = [tuple((x is None, str(type(x)), str(x)) for x in r) for r in out]
    return [r for _, r in sorted(zip(key, out))], [cols[i] for i in idx]


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, False
        if a == b:
            return True, False
        near = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return near, near  # near-match counts but is flagged fp-risk
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False, False
        risk = False
        for x, y in zip(a, b):
            eq, r = cells_equal(x, y)
            if not eq:
                return False, False
            risk = risk or r
        return True, risk
    return a == b, False


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_path = None
    if rest and rest[0] == "--json":
        json_path = rest[1]
        rest = rest[2:]
    only = set(rest)
    results = {}

    def record(name, rows_m, schema_m, hash_m, err=None):
        results[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "err": err}
        if json_path:  # incremental flush: a crash keeps what finished
            tmp = json_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            import os
            os.replace(tmp, json_path)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got_rows = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record(name, False, False, False, err=str(e))
            n_fail += 1
            continue
        g_rows, g_cols = frame(got_rows, got_cols)
        e_rows, e_cols = frame(exp_rows, exp_cols)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}")
            record(name, len(g_rows) == len(e_rows), False, False)
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}")
            record(name, False, True, False)
            n_fail += 1
            continue
        bad = fp_risk = 0
        for gr, er in zip(g_rows, e_rows):
            eq, risk = cells_equal(gr, er)
            if not eq:
                bad += 1
                if bad <= 3:
                    print(f"  {name} diff: got={gr} exp={er}")
            elif risk:
                fp_risk += 1
        if bad:
            print(f"FAIL {name}: {bad}/{len(g_rows)} rows differ")
            record(name, True, True, False)
            n_fail += 1
        else:
            tag = f" (fp-risk rows: {fp_risk})" if fp_risk else ""
            print(f"PASS {name}: {len(g_rows)} rows{tag}")
            record(name, True, True, True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
