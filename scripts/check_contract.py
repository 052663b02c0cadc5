"""Driver-style contract check: entry() smoke + queries() vs oracle_sql()
in DuckDB, order-insensitive value compare. Prints FAILS: [] on success."""
# Drive __spark_entry__ exactly like the driver: smoke entry(), then run
# every queries() entry vs its oracle_sql() in DuckDB at sf0.001.
import sys, os
sys.path.insert(0, '/root/repo')
import __spark_entry__ as E
import duckdb
from capex_data_pipeline_spark.session import get_spark

spark = get_spark(shuffle_partitions=8)
df = E.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
print("ENTRY sample:", rows[0] if rows else None)

sf = os.environ.get('SF_DIR', '/root/testdata/sf0.001')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, os_ = E.queries(), E.oracle_sql()
print("n queries:", len(qs), "n oracles:", len(os_))
fails = []
for name, fn in qs.items():
    sdf = fn(spark, sf)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    if name not in os_:
        print(f"{name}: NO-ORACLE rows={len(srows)}")
        continue
    ores = con.execute(os_[name]).fetchdf()
    ocols = sorted(ores.columns.tolist())
    ok_schema = [c.lower() for c in scols] == [c.lower() for c in ocols]
    # order-insensitive value compare
    def norm(v):
        import math, datetime
        if v is None: return 'NULL'
        if isinstance(v, float):
            if math.isnan(v): return 'NaN'
            return f"{v:.6g}"
        if isinstance(v, (datetime.date, datetime.datetime)): return str(v)
        return str(v)
    sset = sorted(tuple(norm(r[c]) for c in scols) for r in (row.asDict() for row in srows))
    import pandas as pd
    odicts = ores.to_dict('records')
    oset = sorted(tuple(norm(r[c2]) for c2 in ocols) for r in odicts)
    ok_vals = sset == oset
    status = 'OK' if (ok_schema and ok_vals and len(srows) == len(odicts)) else 'MISMATCH'
    if status != 'OK':
        fails.append(name)
        print(f"{name}: {status} rows={len(srows)}/{len(odicts)} schema_ok={ok_schema} cols={scols} vs {ocols}")
        for a, b in list(zip(sset, oset))[:3]:
            if a != b: print('   spark:', a, '\n   duck :', b)
    else:
        print(f"{name}: OK rows={len(srows)}")
print("FAILS:", fails)
spark.stop()
