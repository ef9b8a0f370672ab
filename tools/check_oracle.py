#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: for each SparkEntry query dump,
run its oracle SQL in DuckDB over the raw parquet tables, sort columns
by name and rows by value, and compare."""
import duckdb, json, sys, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    res = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        res.append(tuple(vals))
    res.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [tuple(cols[i] for i in order)] + res

oracle = json.load(open(f"{out}/oracle_sql.json"))
passed, failed = [], []
for name, sql in sorted(oracle.items()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    try:
        got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        got = norm(got_rel.fetchall(), [c.lower() for c in got_rel.columns])
        exp_rel = con.sql(sql)
        exp = norm(exp_rel.fetchall(), [c.lower() for c in exp_rel.columns])
        # the driver's comparator is type-sensitive: a DuckDB HUGEINT (from
        # sum over integers) hashes differently from Spark's BIGINT even
        # when the values are equal — enforce exact column-type parity
        gt = dict(zip([c.lower() for c in got_rel.columns], map(str, got_rel.types)))
        et = dict(zip([c.lower() for c in exp_rel.columns], map(str, exp_rel.types)))
        tdiff = {c: (gt.get(c), et.get(c)) for c in set(gt) | set(et) if gt.get(c) != et.get(c)}
        if tdiff:
            failed.append(name)
            print(f"FAIL {name}: column type mismatch {tdiff}")
        elif got == exp:
            passed.append(name)
        else:
            failed.append(name)
            print(f"FAIL {name}: rows got={len(got)-1} exp={len(exp)-1} cols got={got[0]} exp={exp[0]}")
            for g, e in list(zip(got[1:], exp[1:]))[:200]:
                if g != e:
                    print(f"   first diff:\n   got {g}\n   exp {e}")
                    break
    except Exception as ex:
        failed.append(name)
        print(f"ERROR {name}: {ex}")
    con.close()
print(f"\n{len(passed)} passed, {len(failed)} failed of {len(oracle)}")
if failed:
    print("failed:", failed)
    sys.exit(1)
