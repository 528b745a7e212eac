"""Property-based span-sequence-equality test (SURVEY §5): for arbitrary
docs, explode → reassemble reproduces the offset-sorted (kind, text,
media_ref, offset) sequence exactly."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anomalydetection_spark.operators import reassembly

KINDS = ["text", "image", "audio", "code"]


@st.composite
def doc(draw, idx: int = 0):
    n = draw(st.integers(min_value=1, max_value=6))
    offsets = list(range(n))
    random.Random(draw(st.integers(0, 2**16))).shuffle(offsets)
    spans = []
    for i in range(n):
        kind = draw(st.sampled_from(KINDS))
        text = draw(st.one_of(st.none(), st.text(alphabet="abc xyz", max_size=12)))
        ref = draw(st.one_of(st.none(), st.from_regex(r"m-[0-9]{3}", fullmatch=True)))
        spans.append((kind, text, ref, offsets[i]))
    return spans


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc(), min_size=1, max_size=8))
def test_roundtrip_preserves_span_sequence(spark, docs):
    rows = [
        (f"d{i}", spans, i % 3) for i, spans in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, partition_id int",
    ).repartition(4)
    back = reassembly.reassemble(reassembly.explode_spans(df))
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in back.collect()
    }
    want = {
        f"d{i}": sorted(spans, key=lambda s: s[3]) for i, spans in enumerate(docs)
    }
    assert got == want


# ---------------------------------------------------------------------------
# duplicate-window coverage vs a single-node Python mirror
# ---------------------------------------------------------------------------

def test_duplicate_window_coverage_matches_python_mirror(spark):
    """Randomized corpora (short docs, repeats, shared fragments): the
    distributed window-coverage accounting must equal a dict-based
    single-node mirror of the same definition."""
    import itertools
    import random

    from anomalydetection_spark.operators import dedup

    rng = random.Random(20260818)
    vocab = ["a", "b", "c", "d", "e", "f"]
    k = 3
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dedup.duplicate_window_coverage(df, "doc_id", "text", k=k).collect()
        }

        def windows(t):
            toks = t.split() if t.strip() else [""]
            return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]

        owners = {}
        for i, t in docs:
            for w in set(windows(t)):
                owners.setdefault(w, set()).add(i)
        dup = {w for w, o in owners.items() if len(o) >= 2}
        exp = {
            i: (len(windows(t)), sum(1 for w in windows(t) if w in dup))
            for i, t in docs
        }
        assert got == exp, f"trial {trial}"
