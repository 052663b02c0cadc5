from capex_data_pipeline_spark.plans.pipeline import (  # noqa: F401
    CapexPipelineConfig,
    PipelineResult,
    run_pipeline,
)
