from turboxsl_spark.operators.windows import (
    conv_window,
    with_position,
    with_lag_lead,
    with_forward_fill,
    with_running,
)
from turboxsl_spark.operators.sessionize import with_session_id
from turboxsl_spark.operators.asof import asof_join

__all__ = [
    "conv_window",
    "with_position",
    "with_lag_lead",
    "with_forward_fill",
    "with_running",
    "with_session_id",
    "asof_join",
]
