"""Dev harness mimicking the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (floats to 9 dp).

Usage: python tools/check_oracle.py [--json PATH] [name ...]

``--json PATH`` records the sweep (per-query status/rows/secs + summary,
keyed by the sf directory's basename, merged into PATH if it already holds
earlier sweeps) — how the committed ``CORRECTNESS_SELF_r{N}.json`` artifacts
are produced, one run per scale factor.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402
from anomaly_detection_spark.queries import TABLES  # noqa: E402
from anomaly_detection_spark.session import get_spark  # noqa: E402

import os  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon_pdf(pdf, cols):
    """Canonicalize a pandas frame the way the driver's hasher sees it:
    per-column pandas dtypes matter (DuckDB HUGEINT -> float64 makes 5 render
    as 5.0 and hash-mismatch Spark's int64 5 — r1's 8 red rows), so values
    are stringified AFTER the pandas materialization, column-sorted,
    row-order-insensitive."""
    colvals = []
    for c in cols:
        vals = []
        for v in pdf[c].tolist():  # tolist() unwraps numpy scalars
            if isinstance(v, bool):
                v = int(v)
            elif isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(round(v, 9))
            vals.append(str(v))
        colvals.append(vals)
    return sorted("|".join(vs) for vs in zip(*colvals))


def main():
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = argv or list(qs)
    failed = []
    results = {}

    def record(name, status, rows, t0, detail=None):
        results[name] = {"status": status, "rows": rows,
                         "secs": round(time.time() - t0, 2)}
        if detail:
            results[name]["detail"] = detail[:300]

    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failed.append(name)
            record(name, "FAIL", None, t0, f"spark error: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(spdf)} rows) [{time.time()-t0:.1f}s]")
            record(name, "ROWS_ONLY", len(spdf), t0)
            continue
        try:
            dpdf = con.sql(oracles[name]).fetchdf()
            dcols = list(dpdf.columns)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            record(name, "FAIL", None, t0, f"duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failed.append(name)
            record(name, "FAIL", None, t0, f"columns spark={scols} duck={dcols}")
            continue
        order = sorted(scols)
        a = canon_pdf(spdf, order)
        b = canon_pdf(dpdf, order)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} duck={len(b)}")
            failed.append(name)
            record(name, "FAIL", len(a), t0, f"rowcount spark={len(a)} duck={len(b)}")
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            failed.append(name)
            record(name, "FAIL", len(a), t0, f"values differ, e.g. {diffs}")
        else:
            print(f"PASS {name}: {len(a)} rows [{time.time()-t0:.1f}s]")
            record(name, "PASS", len(a), t0)
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", failed)
    spark.stop()

    if json_path:
        import json
        import subprocess
        from datetime import datetime, timezone

        doc = {}
        if os.path.exists(json_path):
            with open(json_path) as f:
                doc = json.load(f)
        try:
            git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                 capture_output=True, text=True).stdout.strip()
        except Exception:
            git = None
        doc["git"] = git
        doc["generated_utc"] = datetime.now(timezone.utc).isoformat(timespec="seconds")
        sweeps = doc.setdefault("sweeps", {})
        # merge per QUERY, not per sweep: a partial re-run (new queries
        # only) must not clobber the full-registry record
        key = os.path.basename(SF_DIR.rstrip("/"))
        prior = sweeps.get(key, {})
        merged = dict(prior.get("queries", {}))
        merged.update(results)
        all_failed = sorted(
            q for q, r in merged.items() if r.get("status") != "PASS")
        sweeps[key] = {
            "sf_dir": SF_DIR,
            "passed": len(merged) - len(all_failed),
            "total": len(merged),
            "failed": all_failed,
            "queries": merged,
        }
        with open(json_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")

    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
