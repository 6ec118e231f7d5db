"""Native library parity tests (builds via make on first use; skips if no
toolchain)."""
import numpy as np
import pytest

from asr2pass_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native lib unavailable")


def test_native_resample_matches_python():
    from asr2pass_tpu.frontend.audio import linear_resample

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    ref = linear_resample(x, 44100, 16000)
    got = bindings.resample(x, 44100, 16000)
    assert got is not None
    assert abs(len(got) - len(ref)) <= 1
    n = min(len(got), len(ref))
    # interior matches closely (edges differ by padding convention)
    sl = slice(100, n - 100)
    np.testing.assert_allclose(got[sl], ref[sl], atol=2e-4)


def test_native_ac_bias_scores():
    # words over symbol ids: [1,2] and [1,3,4]
    ac = bindings.NativeAcBias([[1, 2], [1, 3, 4]], [2.0, 1.0])
    s, d = ac.step(0, 1)
    assert d == pytest.approx(2.0)  # first word's per-symbol score wins
    s2, d2 = ac.step(s, 2)
    assert d2 == pytest.approx(2.0)  # completes word [1,2]
    assert s2 == 0
    # partial then mismatch retracts
    s3, d3 = ac.step(0, 1)
    s4, d4 = ac.step(s3, 9)
    assert d4 == pytest.approx(-2.0)
    assert ac.final(s3) == pytest.approx(-2.0)


def test_native_ac_failure_transition():
    # overlapping words: [1,1,2]; feeding 1,1,1,2 must still match
    ac = bindings.NativeAcBias([[1, 1, 2]], [1.0])
    s = 0
    total = 0.0
    for sym in [1, 1, 1, 2]:
        s, d = ac.step(s, sym)
        total += d
    # net: matched the word once (3 symbols worth of score)
    assert total == pytest.approx(3.0)


def test_native_edit_align():
    ops, dist = bindings.edit_align([1, 2, 3], [1, 3])
    assert dist == 1
    assert ops.count(2) == 1        # one deletion
    ops, dist = bindings.edit_align([1, 2], [1, 2])
    assert dist == 0 and all(o == 0 for o in ops)
    ops, dist = bindings.edit_align([], [1, 2])
    assert dist == 2 and ops == [3, 3]
