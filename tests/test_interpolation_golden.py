"""Golden-value parity for the resolution-change checkpoint surgery
(VERDICT r3 #6): the importer's geometric rel-pos-bias resample and bicubic
abs-pos-embed resample vs the reference's `interpolate_pos_embed`
(reference models/beit2.py:753-849) run at 224→384 and 224→480 on seeded
tables (fixture from scripts/make_golden_fixtures.py:make_interpolation).
"""
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "golden_interpolation.npz")


@pytest.fixture(scope="module")
def fx():
    return np.load(FIX)


@pytest.mark.parametrize("res,window", [(384, 24), (480, 30)])
def test_rel_pos_bias_table_matches_reference(fx, res, window):
    from xfm_tpu.train.checkpoint import interpolate_rel_pos_bias_table

    got = interpolate_rel_pos_bias_table(fx["src_table"], (window, window))
    want = fx[f"table_{res}"]
    assert got.shape == want.shape
    # identical geometric source grid + cubic-spline resample; difference is
    # scipy spline evaluation order only
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    # the 3 cls-token distances are carried over untouched
    np.testing.assert_array_equal(got[-3:], fx["src_table"][-3:])


@pytest.mark.parametrize("res", [384, 480])
def test_abs_pos_embed_matches_reference(fx, res):
    from xfm_tpu.train.checkpoint import interpolate_abs_pos_embed

    n = (res // 16) ** 2
    got = interpolate_abs_pos_embed(fx["src_pos"], n)
    want = fx[f"pos_{res}"]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got[:, :1], fx["src_pos"][:, :1])  # cls
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
