"""Unit pins for tools/stability_check's strict normalizer — the
sign-of-zero-preserving stringification that lets the cross-config
check see the r8 hazard class (`-0.0` vs `0.0`) that
verify_local's norm deliberately collapses."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from stability_check import _hash, _norm_strict  # noqa: E402


def test_negative_zero_distinct():
    assert _norm_strict(0.0) == "0"
    assert _norm_strict(-0.0) == "-0"
    assert _norm_strict(0.0) != _norm_strict(-0.0)


def test_integerish_and_rounding():
    assert _norm_strict(3.0) == "3"
    assert _norm_strict(None) == "NULL"
    assert _norm_strict(float("nan")) == "NaN"
    assert _norm_strict(True) == "1"
    assert _norm_strict(0.1234567891234) == repr(round(0.1234567891234, 9))
    assert _norm_strict([1.0, -0.0]) == "[1,-0]"


def test_hash_flips_on_zero_sign_only():
    cols = ["a", "b"]
    rows_pos = [(1, 0.0)]
    rows_neg = [(1, -0.0)]
    assert _hash(cols, rows_pos) != _hash(cols, rows_neg)
    # column order must not matter (driver sorts by name)
    assert _hash(["b", "a"], [(0.0, 1)]) == _hash(cols, rows_pos)
    # -0.0 inside arrays is seen too
    assert _hash(["v"], [([0.0],)]) != _hash(["v"], [([-0.0],)])


def test_norm_matches_verify_local_for_ordinary_values():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.verify_local import _norm

    for v in [None, 1, 3.0, -2.5, 0.123456789, float("nan"), "x", True]:
        got, want = _norm_strict(v), _norm(v)
        if isinstance(v, float) and math.isnan(v):
            assert got == want == "NaN"
        else:
            assert got == want
