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
only = set(filter(None, os.environ.get('ONLY', '').split(',')))
if only:
    qs = {k: v for k, v in qs.items() if any(k.startswith(p) for p in only)}
    print("ONLY filter:", sorted(qs))
fails = []
for name, fn in qs.items():
    sdf = fn(spark, sf)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    if name not in os_:
        print(f"{name}: NO-ORACLE rows={len(srows)}")
        continue
    # native fetch (NOT fetchdf): DuckDB returns None for SQL NULL, so
    # nullable doubles/timestamps don't get coerced to NaN/NaT by pandas
    ocur = con.execute(os_[name])
    onames = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    ocols = sorted(onames)
    ok_schema = [c.lower() for c in scols] == [c.lower() for c in ocols]
    # order-insensitive value compare
    def norm(v):
        import math, datetime, decimal
        if v is None: return 'NULL'
        if isinstance(v, decimal.Decimal): v = float(v)
        if isinstance(v, float):
            if math.isnan(v): return 'NaN'
            if v == 0: v = 0.0  # collapse IEEE -0.0
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
        for a, b in list(zip(sset, oset))[:3]:
            if a != b: print('   spark:', a, '\n   duck :', b)
    else:
        print(f"{name}: OK rows={len(srows)}")
# --- S1/S5 contract round-trip (reference: app.py:11-60, app.py:117-122) ---
# Write the synth capex frame as cp1252 CSV (S5), read it back through
# the S1 encoding-fallback chain, and value-compare against DuckDB over
# the SOURCE parquet (the synth restatement oracle_capex._RAW_CTE).
import shutil, tempfile
from pyspark.sql import functions as F
from capex_data_pipeline_spark.oracle_capex import _RAW_CTE
from capex_data_pipeline_spark.plans.synth import synthesize_capex_raw
from capex_data_pipeline_spark.sources.csv import read_csv_with_fallback, sniff_encoding
from capex_data_pipeline_spark.sources.sinks import write_csv_cp1252

SUFFIX = " – note"  # en-dash = byte 0x96 in cp1252, invalid as UTF-8
RT_COLS = [
    "RequestNo", "BranchCode", "RequestFunction", "UserRemarks",
    "CurrentStatus", "AssetCategoryName", "AssetItemName", "ItemCategory",
    "AssetItemAmount", "VendorName", "IsSelectedVendor",
]
marked = (
    synthesize_capex_raw(spark, sf)
    # force a non-ASCII, cp1252-only byte into the data so the fallback
    # chain is genuinely exercised (utf-8 must FAIL to decode the file)
    .withColumn("UserRemarks", F.concat(F.col("UserRemarks"), F.lit(SUFFIX)))
    .select(RT_COLS)
)
tmpdir = tempfile.mkdtemp(prefix="s1s5_")
try:
    out_dir = os.path.join(tmpdir, "capex_cp1252")
    write_csv_cp1252(marked, out_dir)                            # S5
    sniffed = sniff_encoding(out_dir)
    back = read_csv_with_fallback(spark, out_dir, schema=marked.schema)  # S1
    brows = back.collect()

    rt_oracle = f"""
    WITH {_RAW_CTE.strip().rstrip()}
    SELECT RequestNo, BranchCode, RequestFunction,
           UserRemarks || '{SUFFIX}' AS UserRemarks,
           CurrentStatus, AssetCategoryName, AssetItemName, ItemCategory,
           AssetItemAmount, VendorName, IsSelectedVendor
    FROM raw
    """
    ores = con.execute(rt_oracle).fetchdf()
    scols2 = sorted(back.columns)
    ocols2 = sorted(ores.columns.tolist())
    sset2 = sorted(tuple(norm(r[c]) for c in scols2) for r in (row.asDict() for row in brows))
    oset2 = sorted(tuple(norm(r[c]) for c in ocols2) for r in ores.to_dict('records'))
    ok = (
        sniffed == "cp1252"
        and [c.lower() for c in scols2] == [c.lower() for c in ocols2]
        and sset2 == oset2
    )
    if ok:
        print(f"s1_s5_cp1252_roundtrip: OK rows={len(brows)} sniffed={sniffed}")
    else:
        fails.append("s1_s5_cp1252_roundtrip")
        print(f"s1_s5_cp1252_roundtrip: MISMATCH rows={len(brows)}/{len(ores)} sniffed={sniffed}")
        for a, b in list(zip(sset2, oset2))[:5]:
            if a != b: print('   spark:', a, '\n   duck :', b)
finally:
    shutil.rmtree(tmpdir, ignore_errors=True)

print("FAILS:", fails)
spark.stop()
