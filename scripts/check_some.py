"""Subset contract check: `python scripts/check_some.py q112 q113`
runs only the named queries (prefix match) vs their DuckDB oracles at
$SF_DIR (default sf0.001). Same compare as check_contract.py."""
import sys, os
sys.path.insert(0, '/root/repo')
import __spark_entry__ as E
import duckdb
from capex_data_pipeline_spark.session import get_spark

spark = get_spark(shuffle_partitions=8)
sf = os.environ.get('SF_DIR', '/root/testdata/sf0.001')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

prefixes = sys.argv[1:]
qs, os_ = E.queries(), E.oracle_sql()
names = [n for n in qs if any(n.startswith(p) for p in prefixes)]
if not names:
    print("no queries match", prefixes); sys.exit(1)
fails = []
for name in names:
    sdf = qs[name](spark, sf)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    if name not in os_:
        print(f"{name}: NO-ORACLE rows={len(srows)}")
        continue
    ocur = con.execute(os_[name])
    onames = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    ocols = sorted(onames)
    ok_schema = [c.lower() for c in scols] == [c.lower() for c in ocols]
    def norm(v):
        import math, datetime, decimal
        if v is None: return 'NULL'
        if isinstance(v, decimal.Decimal): v = float(v)
        if isinstance(v, float):
            if math.isnan(v): return 'NaN'
            if v == 0: v = 0.0
            return f"{v:.6g}"
        if isinstance(v, (datetime.date, datetime.datetime)): return str(v)
        return str(v)
    sset = sorted(tuple(norm(r[c]) for c in scols) for r in (row.asDict() for row in srows))
    odicts = [dict(zip(onames, r)) for r in orows]
    oset = sorted(tuple(norm(r[c2]) for c2 in ocols) for r in odicts)
    ok_vals = sset == oset
    status = 'OK' if (ok_schema and ok_vals and len(srows) == len(odicts)) else 'MISMATCH'
    if status != 'OK':
        fails.append(name)
        print(f"{name}: {status} rows={len(srows)}/{len(odicts)} schema_ok={ok_schema} cols={scols} vs {ocols}")
        shown = 0
        for a, b in zip(sset, oset):
            if a != b:
                print('   spark:', a, '\n   duck :', b)
                shown += 1
                if shown >= 3: break
    else:
        print(f"{name}: OK rows={len(srows)}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
