"""capex_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference pandas/Streamlit app
``arupmahatha-dtdc/capex-data-pipeline`` (see SURVEY.md), designed to run
on a multi-executor cluster against very large inputs:

- Declarative DataFrame/SQL plans (Catalyst optimizes; no driver loops).
- All rule predicates are native column expressions (no row-at-a-time UDFs).
- Broadcast joins for small dimensions; semi/anti joins for key-set ops.
- The reference's global mutable exclusion audit is replaced with a
  lineage DataFrame produced in the same pass as the filter.

Subpackages:
- ``functions``   scalar/text/key column-expression builders
- ``operators``   rules, projections, joins, aggregates, windows, validation
- ``sources``     CSV (encoding fallback) + Parquet readers
- ``plans``       the end-to-end capex pipeline DAG
- ``streaming``   Structured Streaming operators (+ batch-parity forms)
- ``extensions``  dedup / similarity / text-stats / multimodal at scale
"""

__version__ = "0.1.0"

from capex_data_pipeline_spark.cache import release_persisted  # noqa: F401
from capex_data_pipeline_spark.session import get_spark  # noqa: F401
