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
