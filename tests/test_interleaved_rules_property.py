"""Property-based tests for the interleaved alignment rules
(media_caption_adjacent / media_run_cap): random span arrays with
SCRAMBLED storage order are evaluated through the real Column expressions
and compared against an independent Python statement of each contract.
Kinds are non-null and offsets unique per doc (NULL-kind and NULL/empty
array classes are pinned in tests/test_engine_rules.py); text payloads
exercise the NULL-caption branch."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detection_spark.rules import builtin

KINDS = ["text", "image", "audio"]
TEXTS = [None, "", "cap"]


def spans_strategy():
    span = st.tuples(st.sampled_from(KINDS), st.sampled_from(TEXTS))
    return st.lists(span, min_size=0, max_size=6)


def _with_offsets(doc, rng):
    offs = list(range(len(doc)))
    rng.shuffle(offs)
    return [
        {"kind": k, "text": t, "media_ref": None, "offset": o}
        for (k, t), o in zip(doc, offs)
    ]


def caption_ref(spans):
    srt = sorted(spans, key=lambda s: s["offset"])
    for i, s in enumerate(srt):
        if s["kind"] != "text":
            if i == 0:
                return True
            prev = srt[i - 1]
            if prev["kind"] != "text" or prev["text"] is None:
                return True
    return False


def run_ref(spans, max_run=2):
    srt = sorted(spans, key=lambda s: s["offset"])
    run = 0
    for s in srt:
        run = run + 1 if s["kind"] != "text" else 0
        if run > max_run:
            return True
    return False


@settings(max_examples=12, deadline=None)
@given(st.lists(spans_strategy(), min_size=1, max_size=40),
       st.integers(min_value=0, max_value=2**31))
def test_rules_match_python_reference(spark, docs_lists, seed):
    rng = random.Random(seed)
    rows = [(str(i), _with_offsets(doc, rng))
            for i, doc in enumerate(docs_lists)]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )
    cap = builtin.media_caption_adjacent()
    run = builtin.media_run_cap(max_run=2)
    got = df.select(
        "doc_id",
        cap.violation.alias("cap_v"),
        run.violation.alias("run_v"),
    ).collect()
    want = {
        str(i): (caption_ref(_spans), run_ref(_spans))
        for (i, doc), (_, _spans) in zip(enumerate(docs_lists), rows)
    }
    for r in got:
        assert (r["cap_v"], r["run_v"]) == want[r["doc_id"]], r["doc_id"]
