#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify.scala output
(outDir/<name>.parquet + oracle_sql.json), run each oracle SQL in DuckDB over
the same sf tables, and compare (columns sorted by name, rows sorted, floats
compared with tolerance). Usage:
    python3 tools/verify_local.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(path)
    return t

def canon(cols_names, rows):
    # sort columns by name, then rows
    order = sorted(range(len(cols_names)), key=lambda i: cols_names[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(row):
        return tuple((str(type(v)), str(v)) for v in row)
    out.sort(key=key)
    return [cols_names[i] for i in order], out

def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t = load_result(os.path.join(out_dir, name))
        if t is None:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        if name not in oracles:
            status = "ROWS" if t.num_rows > 0 else "FAIL"
            print(f"{status}  {name}: rows={t.num_rows} (no oracle)")
            n_rowsonly += t.num_rows > 0; n_fail += t.num_rows == 0
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        scols = t.column_names
        srows = [tuple(t.column(c)[i].as_py() for c in scols)
                 for i in range(t.num_rows)]
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1; continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            if not all(approx_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL  {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
