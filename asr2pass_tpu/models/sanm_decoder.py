"""Paraformer parallel decoder: FunASR-faithful SAN-M decoder blocks.

Non-autoregressive: the CIF acoustic embeddings [B, U, D] are refined by N
blocks and projected to vocab logits — all U positions decoded in one
parallel pass (this is what makes Paraformer fast on the MXU: one big
batched matmul chain instead of a token-by-token loop).

Block math matches FunASR's DecoderLayerSANM exactly (the graph the
reference runs as ONNX, driven at onnxruntime/src/paraformer.cpp:463-589 and
paraformer-online.cpp:500-511), so weights converted with
tools/convert_funasr.py are numerically equivalent:

    h = ffn(norm1(x))                 # feed-forward FIRST
    m = fsmn(norm2(h))                # depthwise memory conv, inner residual
    x = x + m                         # single residual from the block input
    x = x + cross_attn(norm3(x), enc)

followed by the `decoders3` tail block (norm1 -> ffn, NO residual) and
after_norm -> output projection.

TPU-native layout: the N uniform blocks are one stacked pytree driven by
``lax.scan`` (flat compile time in depth; explicit leading layer axis for
sharding). Streaming FSMN caches are one [L, B, lorder, D] array scanned
alongside the params — the TPU-native equivalent of the per-layer ONNX
cache tensors (paraformer-online.cpp:347-384,500-511) with the batch on
axis 1.

FSMN context: offline FunASR checkpoints use a centered window
(sanm_shift=0 -> left=right=(k-1)//2); the streaming decoder export is
causal (cache of kernel-1 past frames). In-repo models default to fully
causal in BOTH paths (DecoderConfig.sanm_shift=None) so one parameter set
serves offline and streaming identically; converted FunASR offline models
set sanm_shift from config.yaml.

An optional hotword-bias block (cross-attention over compiled hotword
embeddings) sits before the output head — role of the contextual/hotword
variant the reference feeds `hw_emb` to (paraformer.cpp:515-532).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.ops.attention import scan_layers

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
    keys = jax.random.split(key, cfg.num_blocks + 4)
    layers = []
    for i in range(cfg.num_blocks):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        layers.append({
            "ln1": layer_norm_init(d_model),
            "ffn": ffn_init(k3, d_model, cfg.linear_units),
            "ln2": layer_norm_init(d_model),
            "fsmn": fsmn_init(k1, d_model, cfg.kernel_size),
            "ln3": layer_norm_init(d_model),
            "cross": cross_attention_init(k2, d_model, d_model,
                                          cfg.attention_heads),
        })
    params = {
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        # decoders3 ffn-only tail (FunASR ParaformerSANMDecoder always has 1)
        "tail": {
            "ln1": layer_norm_init(d_model),
            "ffn": ffn_init(keys[-3], d_model, cfg.linear_units),
        },
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


def _kernel_size(params) -> int:
    return params["blocks"]["fsmn"]["taps"].shape[1]


def _fsmn_left(params, cfg: Optional[DecoderConfig]) -> int:
    """Left-context taps for the offline (uncached) path. None/default =
    fully causal; converted FunASR models carry sanm_shift in config."""
    kernel = _kernel_size(params)
    if cfg is None or cfg.sanm_shift is None:
        return kernel - 1
    return (kernel - 1) // 2 + cfg.sanm_shift


def _block(layer, x, enc, enc_mask, mask, heads, cache=None,
           fsmn_left=None, valid_len=None):
    # FunASR DecoderLayerSANM: ffn first, one residual spanning ffn+fsmn
    h = ffn(layer["ffn"], layer_norm(layer["ln1"], x))
    h = layer_norm(layer["ln2"], h)
    if cache is not None:
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        m, new_cache = fsmn_apply_cached(layer["fsmn"], h, cache, valid_len)
    else:
        new_cache = None
        m = fsmn_apply(layer["fsmn"], h, mask, left=fsmn_left)
    x = x + m
    x = x + cross_attention(layer["cross"], layer_norm(layer["ln3"], x),
                            enc, heads, enc_mask)
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    return x, new_cache


def _tail_and_head(params, x, mask, hw_emb, hw_mask, heads):
    if "tail" in params and params["tail"] is not None:
        # decoders3: ffn(norm1(x)) with NO residual (FunASR DecoderLayerSANM
        # with self_attn=None, src_attn=None returns the ffn output alone)
        x = ffn(params["tail"]["ffn"],
                layer_norm(params["tail"]["ln1"], x))
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
    if hw_emb is not None and "hotword" in params:
        x = x + cross_attention(params["hotword"]["cross"],
                                layer_norm(params["hotword"]["ln"], x),
                                hw_emb, heads, hw_mask)
    x = layer_norm(params["after_norm"], x)
    return dense(params["out"], x)


def apply(params, ac_embeds, enc, enc_mask=None, mask=None,
          hw_emb=None, hw_mask=None, heads: int = 4,
          cfg: Optional[DecoderConfig] = None):
    """Offline pass. ac_embeds: [B, U, D] CIF embeddings; enc: [B, T, D].

    Returns logits [B, U, vocab]. FSMN context window comes from
    cfg.sanm_shift (None = fully causal, matching the streaming path).
    """
    if cfg is not None:
        heads = cfg.attention_heads
    left = _fsmn_left(params, cfg)

    if scan_layers(seq_len=min(ac_embeds.shape[1], enc.shape[1])):
        def body(x, layer):
            x, _ = _block(layer, x, enc, enc_mask, mask, heads,
                          fsmn_left=left)
            return x, None

        x, _ = jax.lax.scan(body, ac_embeds, params["blocks"])
    else:
        x = ac_embeds
        n = params["blocks"]["fsmn"]["taps"].shape[0]
        for i in range(n):
            layer = jax.tree.map(lambda a: a[i], params["blocks"])
            x, _ = _block(layer, x, enc, enc_mask, mask, heads,
                          fsmn_left=left)
    return _tail_and_head(params, x, mask, hw_emb, hw_mask, heads)


def init_caches(params, batch: int) -> jnp.ndarray:
    """Zero FSMN caches [L, B, lorder, D] (InitCache role)."""
    l, kernel, d = params["blocks"]["fsmn"]["taps"].shape
    return jnp.zeros((l, batch, kernel - 1, d), jnp.float32)


def apply_streaming(params, ac_embeds, enc, caches,
                    enc_mask=None, mask=None, valid_len=None,
                    hw_emb=None, hw_mask=None, heads: int = 4
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk pass with FSMN cache carry [L, B, lorder, D]. Same math as
    `apply` (with default causal sanm_shift) when the chunks are
    concatenated (tested). valid_len [B] gives the true token count per
    stream for padded chunks."""

    if scan_layers(seq_len=min(ac_embeds.shape[1], enc.shape[1])):
        def body(x, layer_and_cache):
            layer, cache = layer_and_cache
            x, nc = _block(layer, x, enc, enc_mask, mask, heads,
                           cache=cache, valid_len=valid_len)
            return x, nc

        x, new_caches = jax.lax.scan(body, ac_embeds,
                                     (params["blocks"], caches))
    else:
        x = ac_embeds
        n = params["blocks"]["fsmn"]["taps"].shape[0]
        ncs = []
        for i in range(n):
            layer = jax.tree.map(lambda a: a[i], params["blocks"])
            x, nc = _block(layer, x, enc, enc_mask, mask, heads,
                           cache=caches[i], valid_len=valid_len)
            ncs.append(nc)
        new_caches = jnp.stack(ncs)
    return (_tail_and_head(params, x, mask, hw_emb, hw_mask, heads),
            new_caches)
