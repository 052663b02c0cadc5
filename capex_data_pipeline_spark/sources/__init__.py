from capex_data_pipeline_spark.sources.csv import read_csv_with_fallback  # noqa: F401
from capex_data_pipeline_spark.sources.parquet import load_tables, read_table  # noqa: F401
