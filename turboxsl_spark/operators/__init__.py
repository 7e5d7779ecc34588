from turboxsl_spark.operators.windows import (
    conv_window,
    with_position,
    with_lag_lead,
    with_forward_fill,
    with_running,
)
from turboxsl_spark.operators.sessionize import with_session_id
from turboxsl_spark.operators.asof import asof_join
from turboxsl_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
    mix_resample,
)
from turboxsl_spark.operators.packing import pack_fixed_boundary, pack_greedy
from turboxsl_spark.operators.sketches import (
    bloom_build,
    bloom_build_df,
    bloom_merge,
    bloom_probe,
    bloom_probe_join,
    cm_build,
    cm_build_df,
    cm_estimate,
    cm_merge,
    kmv_distinct,
)
from turboxsl_spark.operators.rank import caseorder_keys, exact_quantiles, global_rank, global_topk

__all__ = [
    "conv_window",
    "with_position",
    "with_lag_lead",
    "with_forward_fill",
    "with_running",
    "with_session_id",
    "asof_join",
    "hash_sample",
    "hash_split",
    "stratified_hash_sample",
    "mix_resample",
    "pack_fixed_boundary",
    "pack_greedy",
    "kmv_distinct",
    "bloom_build",
    "bloom_build_df",
    "bloom_merge",
    "bloom_probe",
    "bloom_probe_join",
    "cm_build",
    "cm_build_df",
    "cm_estimate",
    "cm_merge",
    "caseorder_keys",
    "exact_quantiles",
    "global_rank",
    "global_topk",
]
