from anomaly_detection_spark.rules.core import Rule, RuleSet, RowRule, DatasetRule
from anomaly_detection_spark.rules import builtin

__all__ = ["Rule", "RuleSet", "RowRule", "DatasetRule", "builtin"]
