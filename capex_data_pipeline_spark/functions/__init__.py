"""Column-expression builders (pure functions Column -> Column).

Everything here compiles to native Catalyst expressions (JVM-side,
whole-stage-codegen'd). No row-at-a-time Python in any hot path.
"""

from capex_data_pipeline_spark.functions.text import (  # noqa: F401
    any_phrase,
    negation_aware_any,
    negation_aware_phrase,
    phrase_match,
    remark_flag_cols,
)
from capex_data_pipeline_spark.functions.keys import (  # noqa: F401
    robust_key,
    strict_composite_key,
)
