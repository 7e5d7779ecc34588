from turboxsl_spark.plans.featurespec import FeatureSpec, build_features

__all__ = ["FeatureSpec", "build_features"]
