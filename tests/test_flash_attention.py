"""Flash-attention kernel parity vs the XLA reference path (interpret mode
on CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr2pass_tpu.ops.attention import flash_attention


def ref_attention(q, k, v, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d)
    s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", a, v)
    return out * (mask[:, None, :, None] > 0)


@pytest.mark.parametrize("impl", ["ss", "flash"])
@pytest.mark.parametrize("t,lens", [(256, [256, 200]), (300, [300, 123])])
def test_flash_matches_reference(t, lens, impl):
    from asr2pass_tpu.ops.attention import _attention_flash, _attention_ss

    fn = _attention_ss if impl == "ss" else _attention_flash
    b, h, d = 2, 2, 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    mask = np.zeros((b, t), np.float32)
    for i, n in enumerate(lens):
        mask[i, :n] = 1.0
    ref = np.asarray(ref_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask)))
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(v), jnp.asarray(mask),
                        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_flash_fully_masked_rows_zero():
    b, h, t, d = 1, 1, 128, 32
    rng = np.random.default_rng(1)
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    mask = np.zeros((b, t), np.float32)
    mask[0, :64] = 1.0
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(q),
                                     jnp.asarray(q), jnp.asarray(mask),
                                     interpret=True))
    assert np.all(out[0, :, 64:, :] == 0)
    assert np.any(out[0, :, :64, :] != 0)
