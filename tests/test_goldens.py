"""Golden regression vectors: the end-to-end receiver must reproduce
the committed goldens (ephemeris integers exactly, estimates to
tolerance).  Regenerate with tools/make_goldens.py after intentional
behavior changes."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "receiver_golden.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no goldens")
def test_receiver_matches_goldens():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.make_goldens import build

    want = dict(np.load(GOLDEN))
    got = build()
    assert set(got) == set(want)
    for k in sorted(want):
        w, g = want[k], got[k]
        if k.startswith(("mask_", "eph_", "sft_")):
            assert np.array_equal(w, g), (k, w, g)
        elif k.startswith("ephf_"):
            np.testing.assert_allclose(g, w, rtol=0, atol=1e-12,
                                       err_msg=k)
        elif k.startswith("tow_"):
            assert float(w) == float(g), k
        elif k.startswith("dop_"):
            assert abs(float(w) - float(g)) < 1.0, (k, w, g)
        elif k.startswith("cp_"):
            assert abs(float(w) - float(g)) < 0.05, (k, w, g)
        elif k.startswith("cn0_"):
            assert abs(float(w) - float(g)) < 1.0, (k, w, g)
