"""Driver-contract invariants for __spark_entry__: the 50-slot checked
window stays full, ordered, oracle-complete, and duplicate-free — a
regression here silently drops operators out of the driver's
correctness gate."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _entry():
    import __spark_entry__ as e

    return e


def test_every_query_has_an_oracle():
    e = _entry()
    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_window_leads_with_flagship_and_is_full():
    e = _entry()
    names = list(e.queries())
    assert names[0] == "suite_verdicts"
    assert len(e._PRIORITY) == 50
    assert names[:50] == e._PRIORITY


def test_no_duplicates_between_window_and_tail():
    e = _entry()
    assert len(set(e._PRIORITY)) == len(e._PRIORITY)
    assert len(set(e._TAIL)) == len(e._TAIL)
    assert not set(e._PRIORITY) & set(e._TAIL)
    # the ordering covers the registry exactly (queries() asserts no
    # unordered entries; the reverse — stale names in the ordering that no
    # module provides — must not silently shrink the window)
    q = e.queries()
    missing_from_registry = [n for n in e._PRIORITY if n not in q]
    assert not missing_from_registry
