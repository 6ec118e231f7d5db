"""SAN-M encoder (offline full-utterance and streaming chunk modes).

Structure-equivalent to the encoder the reference drives through ONNX
(SURVEY.md §2.1 #4/#5): input LFR+CMVN features are scaled by sqrt(d_model),
summed with the 1-based sinusoidal position encoding (paraformer-online.cpp
:240-268 formula), then N SAN-M blocks (self-attention + FSMN memory branch
+ FFN, pre-norm residuals) and a final LayerNorm.

TPU-native layout: layer 0 (input-dim projection) is separate; layers 1..N
are a SINGLE stacked pytree iterated with ``lax.scan``. One trace of the
block serves all layers — XLA (and especially Pallas: one Mosaic kernel
compile instead of one per layer) compile time stays flat in depth, and the
layer axis is an explicit leading dim for sharding.

Streaming needs no separate weights: the reference's streaming encoder runs
full attention over a [lookback, center, lookahead] overlap-chunk window
(AddOverlapChunk, paraformer-online.cpp:397-413); we do the same by calling
the encoder on the assembled chunk window, so one parameter set serves both
paths.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# scan-vs-unrolled over the stacked layer params (same math, same sharding
# layout) is decided at trace time by ops.attention.scan_layers(): scan on
# TPU when the Pallas attention kernel is active (one kernel call site),
# unrolled otherwise (~3x faster compiles); ASR2PASS_SCAN_LAYERS overrides.
from asr2pass_tpu.ops.attention import scan_layers

from asr2pass_tpu.config import EncoderConfig
from asr2pass_tpu.models.layers import (
    ffn,
    ffn_init,
    layer_norm,
    layer_norm_init,
    length_mask,
    sanm_attention,
    sanm_attention_init,
    sinusoidal_posenc,
)


def _layer_init(key, d_in: int, cfg: EncoderConfig):
    k1, k2 = jax.random.split(key)
    return {
        "ln1": layer_norm_init(d_in),
        "att": sanm_attention_init(k1, d_in, cfg.output_size,
                                   cfg.attention_heads, cfg.kernel_size),
        "ln2": layer_norm_init(cfg.output_size),
        "ffn": ffn_init(k2, cfg.output_size, cfg.linear_units),
    }


def init(key, cfg: EncoderConfig):
    keys = jax.random.split(key, cfg.num_blocks + 1)
    first = _layer_init(keys[0], cfg.input_size, cfg)
    rest = [_layer_init(keys[i], cfg.output_size, cfg)
            for i in range(1, cfg.num_blocks)]
    stacked = (jax.tree.map(lambda *xs: jnp.stack(xs), *rest)
               if rest else None)
    return {"first": first, "rest": stacked,
            "after_norm": layer_norm_init(cfg.output_size)}


def _block(layer, x, mask, heads, residual: bool, att_mask=None):
    h = sanm_attention(layer["att"], layer_norm(layer["ln1"], x),
                       heads, mask, att_mask)
    x = x + h if residual else h
    x = x + ffn(layer["ffn"], layer_norm(layer["ln2"], x))
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    return x


def apply(params, feats, mask: Optional[jnp.ndarray] = None,
          pos_start: int = 0, add_posenc: bool = True,
          d_model: Optional[int] = None, heads: int = 4,
          att_mask: Optional[jnp.ndarray] = None):
    """feats: [B, T, input_size] LFR+CMVN features -> [B, T, d] encodings.

    pos_start: absolute start index for the streaming positional encoding
    (start_idx_cache_ role, paraformer-online.cpp:242-244).
    att_mask: [T, T] or [B, T, T] extra attention mask (the punc VadMask,
    ct-transformer-online.cpp:225-240).
    """
    b, t, d_in = feats.shape
    if d_model is None:
        d_model = params["after_norm"]["g"].shape[0]
    x = feats * jnp.asarray(math.sqrt(d_model), feats.dtype)
    if add_posenc:
        x = x + sinusoidal_posenc(pos_start, t, d_in)[None].astype(x.dtype)
    x = _block(params["first"], x, mask, heads,
               residual=(d_in == d_model), att_mask=att_mask)
    if params["rest"] is not None:
        if scan_layers(seq_len=t):
            def body(x, layer):
                return _block(layer, x, mask, heads, residual=True,
                              att_mask=att_mask), None

            x, _ = jax.lax.scan(body, x, params["rest"])
        else:
            n = jax.tree.leaves(params["rest"])[0].shape[0]
            for i in range(n):
                layer = jax.tree.map(lambda a: a[i], params["rest"])
                x = _block(layer, x, mask, heads, residual=True,
                           att_mask=att_mask)
    return layer_norm(params["after_norm"], x)


def apply_with_lengths(params, feats, lengths, **kw):
    mask = length_mask(lengths, feats.shape[1])
    return apply(params, feats, mask, **kw), mask
