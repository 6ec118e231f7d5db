"""Paraformer parallel decoder: causal FSMN self-blocks + cross-attention.

Non-autoregressive: the CIF acoustic embeddings [B, U, D] are refined by N
blocks of (causal FSMN memory, cross-attention over encoder output, FFN) and
projected to vocab logits — all U positions decoded in one parallel pass
(this is what makes Paraformer fast on the MXU: one big batched matmul chain
instead of a token-by-token loop).

Streaming: each FSMN block carries a [B, lorder, D] cache so chunk-by-chunk
decoding matches the full-sequence pass — the TPU-native equivalent of the
per-layer ONNX cache tensors (paraformer-online.cpp:347-384,500-511).

An optional hotword-bias block (cross-attention over compiled hotword
embeddings) sits before the output head — role of the contextual/hotword
variant the reference feeds `hw_emb` to (paraformer.cpp:515-532).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import DecoderConfig
from asr2pass_tpu.models.layers import (
    cross_attention,
    cross_attention_init,
    dense,
    dense_init,
    ffn,
    ffn_init,
    fsmn_apply,
    fsmn_apply_cached,
    fsmn_init,
    layer_norm,
    layer_norm_init,
)


def init(key, cfg: DecoderConfig, d_model: int, vocab_size: int,
         use_hotword: bool = False):
    keys = jax.random.split(key, cfg.num_blocks + 3)
    layers = []
    for i in range(cfg.num_blocks):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        layers.append({
            "ln1": layer_norm_init(d_model),
            "fsmn": fsmn_init(k1, d_model, cfg.kernel_size),
            "ln2": layer_norm_init(d_model),
            "cross": cross_attention_init(k2, d_model, d_model,
                                          cfg.attention_heads),
            "ln3": layer_norm_init(d_model),
            "ffn": ffn_init(k3, d_model, cfg.linear_units),
        })
    params = {
        "layers": layers,
        "after_norm": layer_norm_init(d_model),
        "out": dense_init(keys[-1], d_model, vocab_size),
    }
    if use_hotword:
        params["hotword"] = {
            "ln": layer_norm_init(d_model),
            "cross": cross_attention_init(keys[-2], d_model, d_model,
                                          cfg.attention_heads),
        }
    return params


def _block(layer, x, enc, enc_mask, mask, heads=4, cache=None,
           causal_left=None, valid_len=None):
    h = layer_norm(layer["ln1"], x)
    if cache is not None:
        if mask is not None:
            h = h * mask[..., None]
        h, new_cache = fsmn_apply_cached(layer["fsmn"], h, cache, valid_len)
    else:
        new_cache = None
        h = fsmn_apply(layer["fsmn"], h, mask, left=causal_left)
    x = x + h
    x = x + cross_attention(layer["cross"], layer_norm(layer["ln2"], x),
                            enc, heads, enc_mask)
    x = x + ffn(layer["ffn"], layer_norm(layer["ln3"], x))
    if mask is not None:
        x = x * mask[..., None]
    return x, new_cache


def apply(params, ac_embeds, enc, enc_mask=None, mask=None,
          hw_emb=None, hw_mask=None, heads: int = 4,
          cfg: Optional[DecoderConfig] = None):
    """Offline pass. ac_embeds: [B, U, D] CIF embeddings; enc: [B, T, D].

    Returns logits [B, U, vocab]. FSMN blocks run fully causal (left =
    kernel-1) so offline and streaming decoders share semantics.
    """
    if cfg is not None:
        heads = cfg.attention_heads
    kernel = params["layers"][0]["fsmn"]["taps"].shape[0]
    x = ac_embeds
    for layer in params["layers"]:
        x, _ = _block(layer, x, enc, enc_mask, mask, heads=heads,
                      causal_left=kernel - 1)
    if hw_emb is not None and "hotword" in params:
        x = x + cross_attention(params["hotword"]["cross"],
                                layer_norm(params["hotword"]["ln"], x),
                                hw_emb, heads, hw_mask)
    x = layer_norm(params["after_norm"], x)
    return dense(params["out"], x)


def init_caches(params, batch: int) -> List[jnp.ndarray]:
    """Zero FSMN caches, one [B, lorder, D] per block (InitCache role)."""
    caches = []
    for layer in params["layers"]:
        kernel, d = layer["fsmn"]["taps"].shape
        caches.append(jnp.zeros((batch, kernel - 1, d), jnp.float32))
    return caches


def apply_streaming(params, ac_embeds, enc, caches,
                    enc_mask=None, mask=None, valid_len=None,
                    hw_emb=None, hw_mask=None, heads: int = 4
                    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Chunk pass with FSMN cache carry. Same math as `apply` when the
    chunks are concatenated (tested in tests/test_models.py). valid_len [B]
    gives the true token count per stream for padded chunks."""
    x = ac_embeds
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        x, nc = _block(layer, x, enc, enc_mask, mask, heads=heads,
                       cache=cache, valid_len=valid_len)
        new_caches.append(nc)
    if hw_emb is not None and "hotword" in params:
        x = x + cross_attention(params["hotword"]["cross"],
                                layer_norm(params["hotword"]["ln"], x),
                                hw_emb, heads, hw_mask)
    x = layer_norm(params["after_norm"], x)
    return dense(params["out"], x), new_caches
