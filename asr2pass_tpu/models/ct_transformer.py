"""CT-Transformer punctuation model (offline + streaming VadMask variant).

Role of the reference's punc ONNX graphs: offline takes [ids, len] and
returns [T, 6] punctuation logits (ct-transformer.cpp:162-204); the
streaming/VAD-realtime variant additionally takes a [1,1,T,T] VadMask that
blocks already-punctuated cache tokens from attending to future text
(ct-transformer-online.cpp:154-240). Here both are one parameter set.

FunASR-faithful structure (CTTransformer): token embedding -> SANMEncoder
(sqrt(d) scale + 1-based sinusoidal posenc + encoders0/encoders +
after_norm — we literally reuse models/sanm_encoder.py, so the converter
maps encoder.* identically to the ASR case) -> linear class head
("decoder" in the torch layout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import EncoderConfig, PuncConfig
from asr2pass_tpu.models import sanm_encoder
from asr2pass_tpu.models.layers import (
    dense,
    dense_init,
    embedding,
    embedding_init,
    length_mask,
)


def _enc_cfg(cfg: PuncConfig) -> EncoderConfig:
    return EncoderConfig(input_size=cfg.embed_dim, output_size=cfg.att_dim,
                         num_blocks=cfg.num_blocks,
                         attention_heads=cfg.attention_heads,
                         linear_units=cfg.linear_units,
                         kernel_size=cfg.kernel_size)


def init(key, cfg: PuncConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": embedding_init(k1, cfg.vocab_size, cfg.embed_dim),
        "encoder": sanm_encoder.init(k2, _enc_cfg(cfg)),
        "out": dense_init(k3, cfg.att_dim, cfg.num_classes),
    }


def apply(params, cfg: PuncConfig, ids, lengths=None, att_mask=None):
    """ids: [B, T] token ids -> [B, T, num_classes] logits.

    att_mask: [B, T, T] or [T, T] (VadMask for the streaming variant)."""
    b, t = ids.shape
    x = embedding(params["embed"], ids)
    mask = None if lengths is None else length_mask(lengths, t)
    h = sanm_encoder.apply(params["encoder"], x, mask,
                           d_model=cfg.att_dim,
                           heads=cfg.attention_heads, att_mask=att_mask)
    return dense(params["out"], h)


def vad_mask(size: int, vad_pos: int) -> np.ndarray:
    """[T, T] mask, 1 = may attend. Rows 0..vad_pos-2 (cache tokens) cannot
    attend to columns >= vad_pos (new text) — exact VadMask semantics
    (ct-transformer-online.cpp:225-240)."""
    m = np.ones((size, size), dtype=np.float32)
    if 0 < vad_pos < size:
        m[: vad_pos - 1, vad_pos:] = 0.0
    return m


@functools.partial(jax.jit, static_argnums=(1,))
def apply_jit(params, cfg: PuncConfig, ids, lengths, att_mask):
    return apply(params, cfg, ids, lengths, att_mask)
