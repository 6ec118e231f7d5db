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
    if impl == "ss":
        got = _attention_ss(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask), q_mask=jnp.asarray(mask),
                            interpret=True)
    else:
        got = _attention_flash(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), jnp.asarray(mask),
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("tq,tk,lens", [(300, 500, [500, 377]),
                                        (256, 120, [120, 64])])
def test_cross_flash_matches_reference(tq, tk, lens):
    """Cross-attention single-shot kernel (Tq != Tk) vs the XLA path of
    layers.cross_attention (softmax over valid keys, q rows not zeroed)."""
    from asr2pass_tpu.ops.attention import cross_flash_attention

    b, h, d = 2, 2, 64
    rng = np.random.default_rng(2)
    q = rng.standard_normal((b, h, tq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, tk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, tk, d)).astype(np.float32)
    kv_mask = np.zeros((b, tk), np.float32)
    for i, n in enumerate(lens):
        kv_mask[i, :n] = 1.0
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d)
    s = jnp.where(jnp.asarray(kv_mask)[:, None, None, :] > 0, s, -1e30)
    ref = np.asarray(jnp.einsum("bhts,bhsd->bhtd",
                                jax.nn.softmax(s, axis=-1), v))
    got = np.asarray(cross_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(kv_mask), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_dispatch_gates(monkeypatch):
    """Env/backend gating: kernels are TPU-only, env vars override."""
    from asr2pass_tpu.ops import attention as att

    # CPU backend in tests -> both gates off regardless of env
    monkeypatch.setenv("ASR2PASS_FLASH_ATTENTION", "1")
    assert not att.use_flash(1000, 128, None)
    assert not att.use_flash_cross(500, 1000, 128)
    assert not att.use_flash_split(5000, 128, None)
    # scan_layers: explicit env wins on any backend
    monkeypatch.setenv("ASR2PASS_SCAN_LAYERS", "1")
    assert att.scan_layers()
    monkeypatch.setenv("ASR2PASS_SCAN_LAYERS", "0")
    assert not att.scan_layers()
    # flash disabled -> cross gate off too
    monkeypatch.setenv("ASR2PASS_FLASH_ATTENTION", "0")
    assert not att.flash_enabled()
    assert not att.use_flash_cross(500, 1000, 128)


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


def test_long_sequence_routes_off_single_shot(monkeypatch):
    """ADVICE r3 (medium): T past the single-shot VMEM bound must not
    reach the unsplit-projection kernel (its [Tk, 2D] K/V block exceeds
    VMEM and fails Mosaic compilation at serve time). On a TPU backend
    the gates route T > MAX_T_SS to the split-head path whose
    flash_attention dispatches the online-softmax kernel; and
    sanm_attention stays correct at such T on the XLA/CPU path."""
    from asr2pass_tpu.models import layers
    from asr2pass_tpu.ops import attention as att

    monkeypatch.setenv("ASR2PASS_FLASH_ATTENTION", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    t_long = att.MAX_T_SS + 512
    assert not att.use_flash(t_long, 128, None)
    assert att.use_flash_split(t_long, 128, None)
    assert att.use_flash(att.MAX_T_SS, 128, None)
    assert not att.use_flash_split(att.MAX_T_SS, 128, None)
    # cross gate already bounds tk
    assert not att.use_flash_cross(512, t_long, 128)

    # numerical: the split-head fallback equals the XLA path (interpret
    # kernels on CPU, tiny dims but T > a patched MAX_T_SS)
    monkeypatch.setattr(att, "MAX_T_SS", 128)
    b, t, d, heads = 1, 160, 32, 2
    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(0)
    p = layers.sanm_attention_init(key, d, d, heads, kernel=5)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[0, 140:] = 0.0
    mask = jnp.asarray(mask)
    monkeypatch.setenv("ASR2PASS_FLASH_ATTENTION", "0")  # XLA reference
    ref = layers.sanm_attention(p, x, heads, mask=mask)
    monkeypatch.setenv("ASR2PASS_FLASH_ATTENTION", "1")

    real_flash = att.flash_attention
    calls = {}

    def spy(q, k, v, m, interpret=False):
        calls["t"] = q.shape[2]
        return real_flash(q, k, v, m, interpret=True)

    monkeypatch.setattr(att, "flash_attention", spy)
    monkeypatch.setattr(layers.jax, "default_backend", lambda: "tpu",
                        raising=False)
    got = layers.sanm_attention(p, x, heads, mask=mask)
    assert calls["t"] == t  # the fallback actually ran
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("heads,tq,tk,lens", [(4, 256, 256, [256, 200]),
                                              (2, 300, 300, [300, 123]),
                                              (4, 200, 384, [384, 250])])
def test_mh_flash_matches_reference(heads, tq, tk, lens):
    """Multi-head single-shot kernel on UNSPLIT projections: contiguous
    d_k column blocks per head must equal the split-heads XLA result in
    merged layout (self- and cross-shaped)."""
    from asr2pass_tpu.ops.attention import mh_flash_attention

    b, d = 2, 128
    d_k = d // heads
    rng = np.random.default_rng(5)
    q = rng.standard_normal((b, tq, d)).astype(np.float32)
    kv = rng.standard_normal((b, tk, 2 * d)).astype(np.float32)
    kv_mask = np.zeros((b, tk), np.float32)
    for i, n in enumerate(lens):
        kv_mask[i, :n] = 1.0

    # reference: split heads from the same column layout
    qh = q.reshape(b, tq, heads, d_k).transpose(0, 2, 1, 3)
    kh = kv[..., :d].reshape(b, tk, heads, d_k).transpose(0, 2, 1, 3)
    vh = kv[..., d:].reshape(b, tk, heads, d_k).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / math.sqrt(d_k)
    s = jnp.where(jnp.asarray(kv_mask)[:, None, None, :] > 0, s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhts,bhsd->bhtd", a, vh)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(b, tq, d))

    got = mh_flash_attention(jnp.asarray(q), jnp.asarray(kv),
                             jnp.asarray(kv_mask), heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)
