"""Meta-tests of the parity gate itself: a gate that cannot fail is
not a gate. These prove `tools/check_parity.compare` flags every drift
class the driver's compare would flag — row count, column set, dtype,
and single-value differences (floats at one ULP included) — and stays
silent on genuinely equal frames regardless of row/column order."""

from __future__ import annotations

import math
import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_parity import canon, compare  # noqa: E402


def _frame(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_equal_frames_pass_under_any_order():
    a = _frame([(1, "x", 1.5), (2, "y", 2.5)], ["k", "s", "v"])
    b = _frame([(2, "y", 2.5), (1, "x", 1.5)], ["k", "s", "v"])[["v", "k", "s"]]
    assert compare("t", a, b) == []


def test_row_count_and_value_drift_flagged():
    a = _frame([(1, 1.5), (2, 2.5)], ["k", "v"])
    assert any(
        "row count" in p for p in compare("t", a, _frame([(1, 1.5)], ["k", "v"]))
    )
    drift = _frame([(1, 1.5), (2, 2.5 + 2**-50)], ["k", "v"])
    probs = compare("t", a, drift)
    assert any("mismatching rows" in p for p in probs)


def test_one_ulp_float_difference_is_caught():
    x = 0.1 + 0.2                      # 0.30000000000000004
    y = 0.3                            # one ULP away
    assert x != y
    probs = compare("t", _frame([(x,)], ["v"]), _frame([(y,)], ["v"]))
    assert any("mismatching rows" in p for p in probs)


def test_column_set_and_null_semantics():
    a = _frame([(1, None)], ["k", "v"])
    assert any(
        "columns" in p for p in compare("t", a, _frame([(1,)], ["k"]))
    )
    # NULL == NULL under the sentinel fill; NULL vs value flagged
    # (as a value mismatch or, for an all-NULL object column vs a
    # float column, as a post-canon dtype diff — either way nonempty)
    assert compare("t", a, _frame([(1, None)], ["k", "v"])) == []
    assert compare("t", a, _frame([(1, 0.0)], ["k", "v"])) != []
    c = _frame([(1, 1.5), (2, None)], ["k", "v"])
    probs = compare("t", c, _frame([(1, 1.5), (2, 0.0)], ["k", "v"]))
    assert any("mismatching rows" in p for p in probs)


def test_canon_normalizes_int_widths_and_bools():
    a = _frame([(1, True)], ["k", "b"])
    a["k"] = a["k"].astype("int32")
    b = _frame([(1, 1)], ["k", "b"])
    b["k"] = b["k"].astype("int64")
    b["b"] = b["b"].astype("int64")
    ca, cb = canon(a), canon(b)
    assert ca.equals(cb)
    assert not math.isnan(float(ca["k"].iloc[0]))
