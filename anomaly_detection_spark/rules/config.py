"""Declarative rule-suite configs: a JSON-serializable suite description
that compiles to a ``RuleSet``, plus the bridge that turns
``profiler.suggest_rules`` output into an enforceable config.

This closes the profile → suggest → persist → enforce loop (the Deequ
``ConstraintSuggestionRunner`` → ``VerificationSuite`` handoff, or a Great
Expectations expectation suite): a suite learned from a clean snapshot is
serialized once as plain JSON, checked into config management, and every
later snapshot is validated against it with the engine's normal fused
single-scan pass — no Python objects cross the persistence boundary.

Reference analogue: the reference hard-codes its rule thresholds in
``/root/reference/anomaly_detection/config.py``; here the suite itself is
data.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Mapping

from . import builtin
from .core import RuleSet

# vocabulary: config "rule" -> builder(entry) -> RowRule | DatasetRule
_BUILDERS = {
    "not_null": lambda e: builtin.not_null(e["col"]),
    "non_empty_array": lambda e: builtin.non_empty_array(e["col"]),
    "accepted_values": lambda e: builtin.accepted_values(
        e["col"], list(e["values"]), allow_null=bool(e.get("allow_null", False))
    ),
    "in_range": lambda e: builtin.in_range(e["col"], int(e["min"]), int(e["max"])),
    "min_completeness": lambda e: builtin.min_completeness(
        e["col"], int(e["min_ppm"])
    ),
    "unique": lambda e: builtin.unique_values(e["col"]),
    "referential": lambda e: builtin.referential(
        catalog_col=e.get("catalog_col", "media_ref")
    ),
    "referential_scalable": lambda e: builtin.referential_scalable(
        catalog_col=e.get("catalog_col", "media_ref")
    ),
    "span_kinds_accepted": lambda e: builtin.span_kinds_accepted(
        list(e.get("kinds", builtin.DEFAULT_KINDS))
    ),
    "text_present_on_text_spans":
        lambda e: builtin.text_present_on_text_spans(),
    "media_ref_present_on_media_spans":
        lambda e: builtin.media_ref_present_on_media_spans(),
    "offsets_valid_native": lambda e: builtin.offsets_valid_native(),
    "text_encoding_clean": lambda e: builtin.text_encoding_clean(),
    "span_sequence_valid_row": lambda e: builtin.span_sequence_valid_row(),
    "media_caption_adjacent": lambda e: builtin.media_caption_adjacent(),
    "media_run_cap": lambda e: builtin.media_run_cap(
        max_run=int(e.get("max_run", 2))
    ),
    "no_pii": lambda e: builtin.no_pii(),
    "functional_dependency": lambda e: builtin.functional_dependency(
        e["determinant"], e["dependent"]
    ),
    "freshness": lambda e: builtin.freshness(
        e["col"], int(e["max_lag_seconds"])
    ),
    "ordinal_contiguity": lambda e: builtin.ordinal_contiguity(
        e["group_col"], e["ord_col"], start=int(e.get("start", 1))
    ),
    "matches_regex": lambda e: builtin.matches_regex(e["col"], e["pattern"]),
    "benford_deviation": lambda e: builtin.benford_deviation(
        e["col"], max_l1_ppm=int(e.get("max_l1_ppm", 300_000)),
        min_rows=int(e.get("min_rows", 1000))
    ),
}


def suite_from_config(cfg: str | Iterable[Mapping[str, Any]]) -> RuleSet:
    """Compile a config (JSON string or list of dict entries, each with a
    ``rule`` key from the vocabulary above) into a RuleSet. Unknown rule
    names fail fast — a typo in checked-in config must not silently drop a
    constraint."""
    entries = json.loads(cfg) if isinstance(cfg, str) else list(cfg)
    suite = RuleSet()
    for e in entries:
        name = e.get("rule")
        if name not in _BUILDERS:
            raise ValueError(
                f"unknown rule {name!r} in suite config "
                f"(known: {sorted(_BUILDERS)})"
            )
        rule = _BUILDERS[name](e)
        if "max_violation_ppm" in e:
            # verdict budget (SLO): valid on EVERY rule in the vocabulary,
            # so it's applied generically rather than plumbed through each
            # builder signature. Rules are frozen dataclasses — replace.
            from dataclasses import replace

            budget = int(e["max_violation_ppm"])
            if budget < 0:
                raise ValueError(
                    f"max_violation_ppm must be >= 0 (rule {name!r})")
            rule = replace(rule, max_violation_ppm=budget)
        suite.add(rule)
    return suite


def suggestions_to_config(suggestions: Iterable) -> list[dict]:
    """Map ``profiler.suggest_rules`` output rows — ``(column, rule,
    param)`` Rows, dicts, or tuples — onto enforceable config entries.

    * ``not_null``            → ``not_null``
    * ``min_completeness_ppm``→ ``min_completeness`` (observed floor)
    * ``unique``              → ``unique`` (hash-agg dataset rule)
    * ``in_range [lo,hi]``    → ``in_range``
    * ``isin a|b|c``          → ``accepted_values`` with ``allow_null``
      (completeness is enforced separately, Deequ ``isContainedIn``
      semantics; values containing ``|`` are unsupported — the suggestion
      side joins on the same delimiter)
    """
    out: list[dict] = []
    for row in suggestions:
        if isinstance(row, Mapping):
            col, rule, param = row["column"], row["rule"], row["param"]
        elif hasattr(row, "__fields__"):  # pyspark Row
            col, rule, param = row["column"], row["rule"], row["param"]
        else:
            col, rule, param = row
        if rule == "not_null":
            out.append({"rule": "not_null", "col": col})
        elif rule == "min_completeness_ppm":
            out.append({"rule": "min_completeness", "col": col,
                        "min_ppm": int(param)})
        elif rule == "unique":
            out.append({"rule": "unique", "col": col})
        elif rule == "in_range":
            lo, hi = param.strip("[]").split(",")
            out.append({"rule": "in_range", "col": col,
                        "min": int(lo), "max": int(hi)})
        elif rule == "isin":
            out.append({"rule": "accepted_values", "col": col,
                        "values": param.split("|"), "allow_null": True})
        elif rule == "matches_regex":
            out.append({"rule": "matches_regex", "col": col,
                        "pattern": param})
        else:
            raise ValueError(f"unknown suggestion rule {rule!r} for {col!r}")
    return out
