"""Profile q90 plan-build vs execution time in a FRESH session (CacheManager
reuses persisted plans across identical run_pipeline calls, so never profile
a second run in the same session)."""
import os, sys, time
sys.path.insert(0, '/root/repo')
from capex_data_pipeline_spark.session import get_spark

sf = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(shuffle_partitions=32)

import __spark_entry__ as E
t0 = time.time()
df = E.queries()["q90_capex_pipeline"](spark, sf)
t1 = time.time()
n = df.count()
t2 = time.time()
print(f"plan-build: {t1-t0:.2f}s  execute: {t2-t1:.2f}s  total: {t2-t0:.2f}s  rows={n}")
spark.stop()
