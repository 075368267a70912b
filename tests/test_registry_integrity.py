"""Source-level registry guards: a duplicate dict key, query function, or
oracle-SQL constant silently SHADOWS its earlier definition (Python keeps
the last), replacing an operator without any runtime error — exactly the
failure a registry of 140 entries invites. Caught here instead.
"""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / \
    "anomaly_detection_spark" / "queries.py"


def _module() -> ast.Module:
    return ast.parse(SRC.read_text())


def test_no_duplicate_registry_keys():
    dup = []
    for node in ast.walk(_module()):
        if isinstance(node, ast.Dict) and len(node.keys) > 50:
            keys = [k.value for k in node.keys
                    if isinstance(k, ast.Constant)]
            dup = [k for k, c in Counter(keys).items() if c > 1]
            break
    else:
        raise AssertionError("QUERIES dict literal not found")
    assert not dup, f"duplicate QUERIES keys shadow earlier entries: {dup}"


def test_no_duplicate_toplevel_definitions():
    names = Counter()
    for node in _module().body:
        if isinstance(node, ast.FunctionDef):
            names[node.name] += 1
        elif isinstance(node, ast.Assign):
            # X = X.format(...) is a deliberate in-place refinement, not a
            # shadowing second definition
            refs = {n.id for n in ast.walk(node.value)
                    if isinstance(n, ast.Name)}
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id.startswith("SQL_") \
                        and t.id not in refs:
                    names[t.id] += 1
    dup = [n for n, c in names.items() if c > 1]
    assert not dup, f"duplicate top-level definitions shadow earlier: {dup}"


def test_every_entry_is_callable_and_oracle_paired():
    from anomaly_detection_spark.queries import QUERIES

    for name, (fn, sql) in QUERIES.items():
        assert callable(fn), name
        # every entry ships an oracle (the repo has no rows-only entries)
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
