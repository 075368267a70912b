"""anomaly_detection_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (not a port) with the query semantics of the reference
``jerry609/anomaly_detection`` pipeline (see SURVEY.md): per-entity/partition
profiling statistics, compiled constraint-rule predicates producing pass/fail
verdicts plus violation rows, distribution-drift detection (PSI/KS) against
historical baselines, and resumable checkpointed runs — re-expressed as
vectorized DataFrame/SQL + Arrow-UDF passes over tables of interleaved
text+media documents ``(doc_id, spans:array<struct<kind,text,media_ref,offset>>,
partition)``.

Design stance (SURVEY.md §7): capabilities, not architecture, carry over.
Everything is declarative DataFrame ops so Catalyst/AQE handle pushdown,
pruning, join selection and skew; Python appears only in Arrow-vectorized
UDFs (never per-row).
"""

from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.rules.core import Rule, RuleSet
from anomaly_detection_spark.engine import ValidationRun

__all__ = ["get_spark", "Rule", "RuleSet", "ValidationRun"]
__version__ = "0.1.0"
