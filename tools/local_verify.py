#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet dir written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name and rows by all columns, and
compares: row count, column names, and values (exact for non-floats, and
both exact + 1e-9-relative for floats, so we can see how close to a strict
hash match we are).
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def type_family(t):
    """Collapse a DuckDB type string into the family the driver's hash
    canonicalization distinguishes. Int widths are interchangeable (they
    render identically), but HUGEINT/DECIMAL are NOT ints: they round-trip
    through float64/object in arrow/pandas and hash differently."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL") or t == "HUGEINT":
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        return "nested"
    return t  # VARCHAR, BOOLEAN, DATE, BLOB, ... compare as-is

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    n_pass = n_fail = 0
    # A registered query that crashed inside Verify leaves an oracle entry
    # but no dumped parquet dir — that is a FAIL, not a silent omission
    # (round 5 shipped a broken query precisely this way).
    for name in sorted(set(oracle) - set(names)):
        print(f"[FAIL] {name}: oracle present but no dumped output "
              f"(query crashed in Verify?)")
        n_fail += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_rel.fetchall())} rows (no oracle)")
            continue
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck_rel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"[FAIL] {name}: columns differ: {scols} vs {dcols}")
            n_fail += 1
            continue
        # Type-family drift check (r10 graph_pagerank lesson: DuckDB's
        # SUM(BIGINT)→HUGEINT widening survives a value compare here but
        # diverges in the driver's hash canonicalization). Both relations
        # are DuckDB-side, so types share one vocabulary.
        stypes = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        dtypes = dict(zip(duck_rel.columns, map(str, duck_rel.types)))
        # Decimal-family OUTPUT columns are a driver-hash hazard even when
        # every value matches here (r13 text_collocations: both local
        # sweeps were [PASS exact] while the driver's hash canonicalization
        # of the DECIMAL(38,0) columns diverged between its parquet reader
        # and its DuckDB oracle). PRESENCE alone fails: decimals may feed
        # internal arithmetic, never a gate's dumped schema.
        dec = [(c, stypes[c]) for c in scols
               if type_family(stypes[c]) == "decimal"]
        dec += [(c, dtypes[c]) for c in dcols
                if type_family(dtypes[c]) == "decimal"]
        if dec:
            print(f"[FAIL] {name}: decimal-family OUTPUT column(s) {dec} — "
                  f"driver hash hazard; keep decimals internal, emit "
                  f"bigint/double/string")
            n_fail += 1
            continue
        tmism = []
        for sc, dc in zip(scols, dcols):
            fs, fd = type_family(stypes[sc]), type_family(dtypes[dc])
            if fs != fd:
                tmism.append((sc, stypes[sc], dtypes[dc]))
        if tmism:
            print(f"[FAIL] {name}: type-family drift (spark vs oracle): {tmism}")
            n_fail += 1
            continue
        sq = spark_rel.project(", ".join(f'"{c}"' for c in scols))
        dq = duck_rel.project(", ".join(f'"{c}"' for c in dcols))
        srows = sorted(sq.fetchall(), key=lambda r: tuple(str(x) for x in r))
        drows = sorted(dq.fetchall(), key=lambda r: tuple(str(x) for x in r))
        if len(srows) != len(drows):
            print(f"[FAIL] {name}: rowcount {len(srows)} vs {len(drows)}")
            n_fail += 1
            continue
        exact = True
        close = True
        first_diff = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if x == y:
                    continue
                exact = False
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    if abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                        if first_diff is None:
                            first_diff = (i, scols[j], x, y, "close")
                        continue
                close = False
                if first_diff is None or first_diff[4] == "close":
                    first_diff = (i, scols[j], x, y, "far")
        if exact:
            print(f"[PASS exact] {name}: {len(srows)} rows")
            n_pass += 1
        elif close:
            print(f"[PASS ~tol ] {name}: {len(srows)} rows; first float diff {first_diff}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: value mismatch at {first_diff}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total dumped")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
