#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare (tooling only — the
engine itself is pure Scala/Spark; this script is never on the JVM
classpath).

Usage: python3 tools/diffcheck.py <verify_outdir>

For each query dir under <verify_outdir>: read the Spark parquet
result, run the corresponding oracle SQL (oracle_sql.json) in DuckDB,
sort columns by name, and compare schema + values row by row.
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

outdir = sys.argv[1]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            bad.append((name, "no spark output"))
            continue
        spark_tbl = pq.read_table(files[0])
        duck_tbl = con.execute(sql).fetch_arrow_table()
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            bad.append((name, f"columns differ: spark={s_cols} duck={d_cols}"))
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            bad.append((name, f"rows differ: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}"))
            continue
        s = spark_tbl.select(s_cols)
        d = duck_tbl.select(d_cols)
        st, dt = [str(f.type) for f in s.schema], [str(f.type) for f in d.schema]
        type_note = "" if st == dt else f" [TYPES spark={st} duck={dt}]"
        sp = s.to_pylist()
        dp = d.to_pylist()
        mism = None
        for i, (a, b) in enumerate(zip(sp, dp)):
            for c in s_cols:
                x, y = a[c], b[c]
                same = (x == y) or (
                    isinstance(x, float) and isinstance(y, float)
                    and (math.isclose(x, y, rel_tol=0, abs_tol=0) or (math.isnan(x) and math.isnan(y))))
                if not same:
                    mism = f"row {i} col {c}: spark={x!r} duck={y!r}"
                    break
            if mism:
                break
        if mism:
            bad.append((name, mism + type_note))
        else:
            status = f"OK ({spark_tbl.num_rows} rows){type_note}"
            ok.append((name, status))
            if type_note:
                bad.append((name, "values equal but " + type_note))
    except Exception as e:  # noqa: BLE001
        bad.append((name, f"EXC {e}"))

for name, msg in ok:
    print(f"  PASS {name}: {msg}")
for name, msg in bad:
    print(f"  FAIL {name}: {msg}")
print(f"\n{len(ok)} pass / {len(bad)} fail (of {len(oracle)})")
sys.exit(1 if bad else 0)
