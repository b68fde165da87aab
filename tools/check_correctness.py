#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle_sql.json
entry in DuckDB against the sf parquet tables and compares with the Spark
parquet dump (rows / column-name set / exact sorted-values equality, doubles
compared bitwise like a value hash would).

Type-faithful: also compares DuckDB-level column TYPES (spark-dump relation
vs oracle relation). The driver hashes Arrow-level values, so e.g. DuckDB
SUM(BIGINT) -> HUGEINT vs Spark BIGINT is a real driver failure even though
Python ints compare equal — round 2 shipped 3 red rows invisible to the old
value-only compare. Run at sf0.001 AND sf0.01 (and sf0.1 when touching
perf-sensitive oracles) before committing oracle changes."""
import duckdb, json, struct, sys, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        return ('f', struct.pack('<d', v).hex())
    if isinstance(v, bool):
        return ('b', v)
    return (type(v).__name__, v)

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_path = f"{outdir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"{name}: MISSING spark output")
        fails.append(name)
        continue
    sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
    try:
        odf = con.sql(oracle[name])
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{name}: SCHEMA cols {scols} vs {ocols}")
        fails.append(name)
        continue
    stypes = dict(zip(sdf.columns, (str(t) for t in sdf.types)))
    otypes = dict(zip(odf.columns, (str(t) for t in odf.types)))
    badtypes = [(c, stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]]
    if badtypes:
        for c, st, ot in badtypes:
            print(f"{name}: TYPE mismatch col {c}: spark={st} oracle={ot}")
        fails.append(name)
        continue
    srows = sorted(tuple(canon(v) for v in r) for r in
                   con.sql(f"SELECT {', '.join(scols)} FROM sdf").fetchall())
    orows = sorted(tuple(canon(v) for v in r) for r in
                   con.sql(f"SELECT {', '.join(ocols)} FROM odf").fetchall())
    if len(srows) != len(orows):
        print(f"{name}: ROWS {len(srows)} vs {len(orows)}")
        fails.append(name)
    elif srows != orows:
        diff = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b][:3]
        print(f"{name}: HASH mismatch ({len(srows)} rows); first diffs:")
        for i in diff:
            print(f"  spark:  {srows[i]}")
            print(f"  oracle: {orows[i]}")
        fails.append(name)
    else:
        print(f"{name}: OK ({len(srows)} rows)")
print(f"\n{'ALL GREEN' if not fails else 'FAILS: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
