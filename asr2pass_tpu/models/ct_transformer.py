"""CT-Transformer punctuation model (offline + streaming VadMask variant).

Role of the reference's punc ONNX graphs: offline takes [ids, len] and
returns [T, 6] punctuation logits (ct-transformer.cpp:162-204); the
streaming/VAD-realtime variant additionally takes a [1,1,T,T] VadMask that
blocks already-punctuated cache tokens from attending to future text
(ct-transformer-online.cpp:154-240). Here both are one parameter set:
embedding -> SAN-M blocks (att_mask plumbs the VadMask) -> class head.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import PuncConfig
from asr2pass_tpu.models.layers import (
    dense,
    dense_init,
    embedding,
    embedding_init,
    ffn,
    ffn_init,
    layer_norm,
    layer_norm_init,
    length_mask,
    sanm_attention,
    sanm_attention_init,
    sinusoidal_posenc,
)


def init(key, cfg: PuncConfig):
    keys = jax.random.split(key, cfg.num_blocks + 2)
    layers = []
    for i in range(cfg.num_blocks):
        k1, k2 = jax.random.split(keys[i])
        d_in = cfg.embed_dim if i == 0 else cfg.att_dim
        layers.append({
            "ln1": layer_norm_init(d_in),
            "att": sanm_attention_init(k1, d_in, cfg.att_dim,
                                       cfg.attention_heads, cfg.kernel_size),
            "ln2": layer_norm_init(cfg.att_dim),
            "ffn": ffn_init(k2, cfg.att_dim, cfg.linear_units),
        })
    return {
        "embed": embedding_init(keys[-1], cfg.vocab_size, cfg.embed_dim),
        "layers": layers,
        "after_norm": layer_norm_init(cfg.att_dim),
        "out": dense_init(keys[-2], cfg.att_dim, cfg.num_classes),
    }


def apply(params, cfg: PuncConfig, ids, lengths=None, att_mask=None):
    """ids: [B, T] token ids -> [B, T, num_classes] logits.

    att_mask: [B, T, T] or [T, T] (VadMask for the streaming variant)."""
    b, t = ids.shape
    x = embedding(params["embed"], ids)
    x = x + sinusoidal_posenc(0, t, cfg.embed_dim)[None]
    mask = None if lengths is None else length_mask(lengths, t)
    for i, layer in enumerate(params["layers"]):
        h = sanm_attention(layer["att"], layer_norm(layer["ln1"], x),
                           cfg.attention_heads, mask, att_mask)
        x = h if i == 0 and cfg.embed_dim != cfg.att_dim else x + h
        x = x + ffn(layer["ffn"], layer_norm(layer["ln2"], x))
        if mask is not None:
            x = x * mask[..., None]
    x = layer_norm(params["after_norm"], x)
    return dense(params["out"], x)


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
