"""Sequence-parallel encoder == single-device encoder (8-device CPU mesh)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from asr2pass_tpu.config import EncoderConfig
from asr2pass_tpu.models import sanm_encoder
from asr2pass_tpu.parallel.sequence import encode_sequence_parallel


def test_sequence_parallel_matches_single():
    cfg = EncoderConfig(input_size=560, output_size=32, num_blocks=3,
                        attention_heads=2, linear_units=64)
    params = sanm_encoder.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 64  # 8 frames per device on the 8-device mesh
    feats = rng.standard_normal((b, t, 560)).astype(np.float32)

    ref = sanm_encoder.apply(params, feats, d_model=32,
                             heads=cfg.attention_heads)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    got = encode_sequence_parallel(params, feats, cfg, mesh, axis="sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_sequence_parallel_masked_padding():
    """Padded (masked) SP encoding == single-device masked encoding — the
    serving path pads long segments to a multiple of the mesh axis."""
    from asr2pass_tpu.models.layers import length_mask

    cfg = EncoderConfig(input_size=560, output_size=32, num_blocks=2,
                        attention_heads=2, linear_units=64)
    params = sanm_encoder.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    b, t, valid = 1, 64, 50
    feats = rng.standard_normal((b, t, 560)).astype(np.float32)
    feats[0, valid:] = 0.0

    import jax.numpy as jnp

    mask = length_mask(jnp.asarray([valid]), t)
    ref = sanm_encoder.apply(params, feats, mask, d_model=32,
                             heads=cfg.attention_heads)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    got = encode_sequence_parallel(params, feats, cfg, mesh, axis="sp",
                                   lengths=[valid])
    np.testing.assert_allclose(np.asarray(got)[0, :valid],
                               np.asarray(ref)[0, :valid],
                               rtol=2e-3, atol=2e-4)


def test_offline_recognizer_sp_routing():
    """ParaformerOffline with an sp_mesh routes >threshold segments
    through the sequence-parallel path and produces the same text as the
    single-device path (VERDICT r2 item 6: a served request can exceed
    the single-chip bucket without VAD force-cutting)."""
    from asr2pass_tpu.config import paraformer_tiny
    from asr2pass_tpu.models import paraformer
    from asr2pass_tpu.runtime.offline_asr import ParaformerOffline
    from asr2pass_tpu.text.vocab import make_test_vocab

    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000 * 12) * 0.1).astype(np.float32)

    plain = ParaformerOffline(params, cfg, vocab)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    sp = ParaformerOffline(params, cfg, vocab, sp_mesh=mesh,
                           sp_threshold=64)   # 12 s >> 64-frame threshold

    ref_text, _ = plain.recognize(samples)
    sp_text, _ = sp.recognize(samples)
    assert sp_text == ref_text
    assert len(sp_text) > 0
