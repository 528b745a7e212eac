"""Property-based golden tests (SURVEY §5): the distributed normalizer and
C4 line filter must match a single-node Python reference on arbitrary
text — markup, entities, control chars, unicode combining sequences,
multi-line structure. The reference mirrors the documented transform
chain step for step; any engine/oracle divergence (regex dialect, trim
semantics, NFC behavior) surfaces as a counterexample."""

from __future__ import annotations

import re
import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anomalydetection_spark.operators import normalize

# alphabet stresses every transform: tags, entities, control chars,
# combining accents, CJK, whitespace runs
ALPHABET = "ab <>/&;ltgmpqu\t\n\x07\x1f́é中. !?\"{x0123"


def py_normalize(s: str) -> str:
    s = re.sub(r"<[^>]+>", "", s)
    for ent, repl in normalize.ENTITIES:
        s = s.replace(ent, repl)
    s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", s)
    s = re.sub(r"\s+", " ", s, flags=re.ASCII)
    s = s.strip(" ")
    return unicodedata.normalize("NFC", s)


def py_c4(s: str) -> tuple[int, int, str]:
    lines = s.split("\n")
    kept = 0
    for line in lines:
        t = line.strip(" ")
        words = len(re.split(r"\s+", t, flags=re.ASCII))
        if t and t.endswith(normalize.TERMINAL_PUNCT) and words >= normalize.MIN_WORDS_PER_LINE:
            kept += 1
    low = s.lower()
    if any(p in low for p in normalize.BAN_PHRASES):
        reason = "ban_phrase"
    elif "{" in s:
        reason = "brace"
    elif kept < normalize.MIN_LINES_PER_DOC:
        reason = "too_few_lines"
    else:
        reason = "kept"
    return len(lines), kept, reason


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(st.text(alphabet=ALPHABET, max_size=60), min_size=1, max_size=12))
def test_normalize_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: r["normalized"]
        for r in normalize.normalize_docs(df, "id", "text").collect()
    }
    assert got == {i: py_normalize(t) for i, t in enumerate(texts)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=ALPHABET + "\n", max_size=80), min_size=1, max_size=12
    )
)
def test_c4_filter_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: (r["n_lines"], r["n_kept_lines"], r["reason"])
        for r in normalize.c4_line_filter(df, "id", "text").collect()
    }
    assert got == {i: py_c4(t) for i, t in enumerate(texts)}
