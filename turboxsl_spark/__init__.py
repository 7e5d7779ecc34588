"""turboxsl_spark — a PySpark-native point-in-time feature-engineering engine.

Built from scratch with the query capabilities of Litres/turboxsl (a
multithreaded C XSLT/XPath engine, surveyed in SURVEY.md), re-expressed
Spark-first: the DataFrame/SQL API declares the logical plan, Catalyst +
Tungsten pick the physical strategy, and vectorized pandas/Arrow UDFs
cover only what built-ins cannot express.

Data model (SURVEY.md §1.3): conversations of turns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``; a conversation plays the role of one XML document, a
turn the role of a node, and XPath axes become window navigations.
"""

from turboxsl_spark.session import get_spark
from turboxsl_spark.plans.featurespec import FeatureSpec, build_features
from turboxsl_spark.engine import Engine

__all__ = ["get_spark", "FeatureSpec", "build_features", "Engine"]
