"""The correctness gate's compare machinery is itself load-bearing —
these tests pin that it DETECTS differences (a broken comparator that
hashes everything equal would turn the whole gate green forever)."""

from __future__ import annotations

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "check_correctness.py"))
_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("check_correctness", _mod)
_spec.loader.exec_module(_mod)

_hash, _canon = _mod._hash, _mod._canon


class TestValueHash:
    def test_value_change_changes_hash(self):
        a = _hash([(1, "x"), (2, "y")], ["id", "s"])
        b = _hash([(1, "x"), (2, "z")], ["id", "s"])
        assert a != b

    def test_row_order_insensitive(self):
        a = _hash([(1, "x"), (2, "y")], ["id", "s"])
        b = _hash([(2, "y"), (1, "x")], ["id", "s"])
        assert a == b

    def test_column_order_insensitive_by_name(self):
        # same data, columns presented in different order: the hash
        # sorts columns by NAME before hashing values
        a = _hash([(1, "x")], ["id", "s"])
        b = _hash([("x", 1)], ["s", "id"])
        assert a == b

    def test_row_multiset_not_set(self):
        a = _hash([(1,), (1,)], ["id"])
        b = _hash([(1,)], ["id"])
        assert a != b

    def test_extra_row_changes_hash(self):
        a = _hash([(1,)], ["id"])
        b = _hash([(1,), (2,)], ["id"])
        assert a != b


class TestCanon:
    def test_float_noise_collapses(self):
        # engine float noise beyond 6 significant digits must not flip
        # the compare
        assert _canon(0.30000000000000004) == _canon(0.3)
        assert _canon(1234567.0001) == _canon(1234567.0002)

    def test_distinguishes_real_differences(self):
        assert _canon(0.123456) != _canon(0.123457)
        assert _canon(None) != _canon("")
        assert _canon(True) == _canon(1)   # documented: bool ≡ 0/1
        assert _canon(float("nan")) == "nan"

    def test_nested_structures(self):
        assert _canon([1, [2, 3]]) == _canon([1, [2, 3]])
        assert _canon([1, 2]) != _canon([2, 1])
        assert _canon({"b": 2, "a": 1}) == _canon({"a": 1, "b": 2})
        assert _canon(b"\x00\xff") == "00ff"


class TestDocTraceability:
    def test_every_catalog_query_is_documented_in_survey(self):
        import __spark_entry__ as e

        survey = open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SURVEY.md")).read()
        missing = sorted(n for n in e.queries() if n not in survey)
        assert missing == [], (
            f"catalog queries missing from SURVEY.md: {missing} — add "
            f"them to the §2.11 table or the §2.12 traceability map")

    def test_every_query_has_oracle_or_is_known_rows_only(self):
        import __spark_entry__ as e

        # sample_seeded left this set at r8 (bounds oracle);
        # dedup_simhash / text_rolling_fp left at r9 (planted-duplicate
        # invariant oracles) — the documented rows-only set is EMPTY
        known_rows_only: set[str] = set()
        o = e.oracle_sql()
        unexpected = sorted(n for n in e.queries()
                            if n not in o and n not in known_rows_only)
        assert unexpected == [], (
            f"queries without an oracle that are not in the documented "
            f"rows-only set: {unexpected}")

    def test_driver_window_is_full_and_oracle_backed(self):
        # the driver hard-verifies the FIRST 50 queries() entries: the
        # window must be exactly orderable (50+ distinct known names)
        # and every windowed query must carry an oracle — a rows-only
        # query in the window wastes a hard-signal slot
        import __spark_entry__ as e

        q, o = e.queries(), e.oracle_sql()
        window = list(q)[:50]
        assert len(set(window)) == 50
        unoracled = [n for n in window if n not in o]
        assert unoracled == [], (
            f"driver-window queries without oracles: {unoracled}")
        ordered_prefix = [n for n in e._DRIVER_FIRST if n in q][:50]
        assert window == ordered_prefix
