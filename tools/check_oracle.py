#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark output) and runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet tables registered as views. Compares row counts, sorted column
names, and the multiset of rows (values normalized: floats rounded to 9
decimals, Decimals to str).
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    # Decimal, datetime, str, int
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        # NO normalize(): the driver's hash is representation-sensitive, so a
        # scale difference the old normalize() masked is a real failure here
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def decimal_cols(colnames, rows):
    """Columns carrying decimal.Decimal values (DECIMAL/HUGEINT results):
    these CANNOT pass the round driver's value hash (its two readers
    disagree on decimal representation — Decimal object vs float64), so
    flag them as failures even when values compare equal locally. Gate
    outputs must be BIGINT/DOUBLE/VARCHAR/TIMESTAMP/BOOL only."""
    import decimal
    bad = []
    for i, c in enumerate(colnames):
        if any(isinstance(r[i], decimal.Decimal) for r in rows):
            bad.append(c)
    return bad

def rows_key(rows, colnames):
    # driver sorts columns by name; emulate: reorder values by sorted colnames
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output files"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        bad_dec = decimal_cols(got_cols, got_rows)
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got_rows)} rows)"); continue
        try:
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            bad_dec += [c for c in decimal_cols(exp_cols, exp_rows)
                        if c not in bad_dec]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if bad_dec:
            print(f"FAIL {name}: decimal-typed output columns {bad_dec} "
                  "(cannot pass the driver hash — emit BIGINT/DOUBLE/VARCHAR)")
            n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1; continue
        gk, ek = rows_key(got_rows, got_cols), rows_key(exp_rows, exp_cols)
        if gk != ek:
            diffs = [(a, b) for a, b in zip(gk, ek) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(got_rows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
