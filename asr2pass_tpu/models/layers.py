"""Functional building blocks: param-pytree init/apply pairs.

Every module is a pair of pure functions — ``init(key, ...) -> params`` and
``apply(params, x, ...) -> y`` — so models compose into plain pytrees that
jit, vmap, shard (pjit) and checkpoint without framework machinery. This is
the TPU-native re-design of the reference's opaque ONNX graphs: we own every
layer (SURVEY.md §7 design stance).

Architecture notes (structure equivalent to the models the reference runs,
re-derived, not copied):
  * SAN-M attention = multi-head self-attention + an FSMN "memory" branch:
    a depthwise conv over the value projections with an inner residual,
    added to the attention output.
  * FSMN block = depthwise 1-D conv with configurable left/right context;
    the streaming decoder keeps a per-layer cache of the last `lorder`
    frames (the [1, fsmn_dims, fsmn_lorder] caches of
    paraformer-online.cpp:347-384 become leading-axis-batched state here).
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Matmul precision: weights/activations are fp32; DEFAULT precision lets the
# MXU use bf16 passes where CER-safe. Attention logits and feature extraction
# use HIGHEST explicitly.
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def dense_init(key, d_in: int, d_out: int, bias: bool = True):
    scale = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(p, x):
    # output dtype follows the input (bf16 in the serving path); the MXU
    # accumulates fp32 internally regardless. Quantized params (int8 "w_q"
    # + per-output "scale", see utils.quantize_params) run the int8 MXU
    # path with dynamic per-row activation quantization — the TPU-native
    # equivalent of the reference's int8 model_quant.onnx default.
    if "w_q" in p:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        a_scale = jnp.maximum(amax, 1e-6) / 127.0
        x_q = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
        y = jnp.dot(x_q, p["w_q"], preferred_element_type=jnp.int32)
        y = y.astype(x.dtype) * (a_scale * p["scale"]).astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    if "w_q8" in p:
        # weight-only int8 (w8a16): int8 weights stream from HBM and are
        # dequantized on the fly; the matmul runs on the bf16 MXU path.
        # Per-output-channel scale folds in after the matmul.
        y = jnp.dot(x, p["w_q8"].astype(x.dtype)) * p["scale"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(d: int):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    # eps matches torch nn.LayerNorm (the FunASR models' default), so
    # converted checkpoints are numerically faithful
    # statistics in fp32 even when activations are bf16
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype)


def embedding_init(key, vocab: int, d: int):
    return {"table": jax.random.normal(key, (vocab, d), jnp.float32) * 0.02}


def embedding(p, ids):
    return jnp.take(p["table"], ids, axis=0)


def sinusoidal_posenc(start: int, length: int, depth: int) -> jnp.ndarray:
    """Positions start+1 .. start+length (1-based), FunASR-style layout
    [sin | cos] over depth/2 timescales. Matches the streaming pos-emb of
    paraformer-online.cpp:240-268 (scale = -log(10000)/(depth/2-1))."""
    log_timescale_increment = math.log(10000.0) / (depth // 2 - 1)
    inv_timescales = jnp.exp(
        jnp.arange(depth // 2, dtype=jnp.float32) * -log_timescale_increment
    )
    positions = jnp.arange(start + 1, start + length + 1, dtype=jnp.float32)
    scaled = positions[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


def length_mask(lengths, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, T] float mask."""
    ar = jnp.arange(max_len)[None, :]
    return (ar < lengths[:, None]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# FSMN depthwise memory block
# ---------------------------------------------------------------------------

def fsmn_init(key, d: int, kernel: int):
    # depthwise conv weights [kernel, d], no bias (memory taps)
    scale = 1.0 / math.sqrt(kernel)
    return {"taps": jax.random.uniform(key, (kernel, d), jnp.float32,
                                       -scale, scale)}


def fsmn_apply(p, x, mask=None, left: Optional[int] = None):
    """Symmetric (encoder) or causal (decoder) depthwise memory conv.

    x: [B, T, D]. left = number of left-context taps; default centers the
    kernel. Inner residual: out = x + conv(x), masked.
    """
    kernel = p["taps"].shape[0]
    taps = p["taps"].astype(x.dtype)
    if left is None:
        left = (kernel - 1) // 2
    right = kernel - 1 - left
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    pad = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    # depthwise conv as sum of shifted scaled copies — XLA fuses this into a
    # few vector ops; T is small per step and D rides the lane dimension.
    t = x.shape[1]
    out = jnp.zeros_like(x)
    for k in range(kernel):
        out = out + pad[:, k: k + t, :] * taps[k]
    out = x + out
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out


def fsmn_apply_cached(p, x, cache, valid_len=None):
    """Causal FSMN step with streaming cache.

    x: [B, T, D] right-padded, cache: [B, lorder, D] (last lorder valid
    frames of the stream). Returns (out, new_cache). When `valid_len` [B]
    is given (padded chunks with per-stream token counts), the cache
    advances by exactly valid_len frames so padding never pollutes state.
    Equivalent role to the per-layer [1, fsmn_dims, fsmn_lorder] ONNX cache
    tensors (paraformer-online.cpp:374-383,500-511)."""
    kernel = p["taps"].shape[0]
    taps = p["taps"].astype(x.dtype)
    lorder = kernel - 1
    t = x.shape[1]
    ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    out = jnp.zeros_like(x)
    for k in range(kernel):
        out = out + ext[:, k: k + t, :] * taps[k]
    out = x + out
    if lorder == 0:
        return out, cache
    if valid_len is None:
        new_cache = ext[:, -lorder:, :]
    else:
        # cache rows = ext[valid_len + i] for i in [0, lorder)
        idx = valid_len[:, None] + jnp.arange(lorder)[None, :]
        new_cache = jnp.take_along_axis(ext, idx[..., None], axis=1)
    return out, new_cache


# ---------------------------------------------------------------------------
# SAN-M multi-head attention
# ---------------------------------------------------------------------------

def sanm_attention_init(key, d_in: int, d: int, heads: int, kernel: int):
    k1, k2, k3 = jax.random.split(key, 3)
    del heads  # head count is architecture config, passed at apply time
    return {
        "qkv": dense_init(k1, d_in, 3 * d),
        "out": dense_init(k2, d, d),
        "fsmn": fsmn_init(k3, d, kernel),
    }


def _split_heads(x, heads):
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def sanm_attention(p, x, heads: int, mask=None, att_mask=None):
    """SAN-M self-attention.

    x: [B, T, Din]; mask: [B, T] padding mask; att_mask: [B, T, T] or
    [T, T] additional attention mask (chunk masks for streaming).
    Returns [B, T, D].
    """
    qkv = dense(p["qkv"], x)
    d = qkv.shape[-1] // 3
    d_k = d // heads
    from asr2pass_tpu.ops.attention import (flash_attention,
                                            mh_flash_attention, use_flash,
                                            use_flash_split)

    if use_flash(x.shape[1], d_k, att_mask):
        # feed the kernel the UNSPLIT projection layout: heads live in
        # contiguous column blocks, so no split/transpose/merge passes
        # over the [B,T,D] activations are materialized at all
        mem = fsmn_apply(p["fsmn"], qkv[..., 2 * d:], mask)
        kv_mask = (mask if mask is not None
                   else jnp.ones(x.shape[:2], jnp.float32))
        ctx = mh_flash_attention(qkv[..., :d], qkv[..., d:], kv_mask,
                                 heads)
        out = dense(p["out"], ctx) + mem
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out
    q, k, v = jnp.split(qkv, 3, axis=-1)
    mem = fsmn_apply(p["fsmn"], v, mask)
    qh = _split_heads(q, heads)
    kh = _split_heads(k, heads)
    vh = _split_heads(v, heads)
    if use_flash_split(x.shape[1], d_k, att_mask):
        # T beyond the single-shot VMEM bound (un-VAD-split inputs past
        # ~4 min): split-head online-softmax kernel streams K/V per head
        # instead of pinning [Tk, 2D] in VMEM (which fails Mosaic
        # compilation) or round-tripping [B,H,T,T] scores through HBM
        kv_mask = (mask if mask is not None
                   else jnp.ones(x.shape[:2], jnp.float32))
        ctx = flash_attention(qh, kh, vh, kv_mask)
        out = dense(p["out"], _merge_heads(ctx)) + mem
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out
    # bf16 score matrices (opt-in) halve the dominant HBM traffic of
    # long-segment attention; logits are max-subtracted inside softmax so
    # bf16 range is safe, at ~3 decimal digits of logit precision
    sdtype = (x.dtype if os.environ.get("ASR2PASS_BF16_SCORES", "0") == "1"
              else jnp.float32)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=sdtype) / math.sqrt(d_k)
    neg = jnp.asarray(-30000.0 if sdtype == jnp.bfloat16 else -1e30, sdtype)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :] > 0, scores, neg)
    if att_mask is not None:
        am = att_mask if att_mask.ndim == 3 else att_mask[None]
        scores = jnp.where(am[:, None, :, :] > 0, scores, neg)
    att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", att, vh)
    out = dense(p["out"], _merge_heads(ctx)) + mem
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out


def cross_attention_init(key, d: int, d_mem: int, heads: int):
    k1, k2, k3 = jax.random.split(key, 3)
    del heads  # head count is architecture config, passed at apply time
    return {
        "q": dense_init(k1, d, d),
        "kv": dense_init(k2, d_mem, 2 * d),
        "out": dense_init(k3, d, d),
    }


def cross_attention(p, x, mem, heads: int, mem_mask=None):
    """x: [B, T, D] queries; mem: [B, S, Dm] keys/values."""
    q = dense(p["q"], x)
    kv = dense(p["kv"], mem)
    d_k = q.shape[-1] // heads
    from asr2pass_tpu.ops.attention import (mh_flash_attention,
                                            use_flash_cross)

    if use_flash_cross(x.shape[1], mem.shape[1], d_k):
        # unsplit projection layout straight into the kernel (see
        # sanm_attention): no head transposes/splits/merges materialized
        kv_mask = (mem_mask if mem_mask is not None
                   else jnp.ones(mem.shape[:2], jnp.float32))
        ctx = mh_flash_attention(q, kv, kv_mask, heads)
        return dense(p["out"], ctx)
    k, v = jnp.split(kv, 2, axis=-1)
    qh, kh, vh = (_split_heads(a, heads) for a in (q, k, v))
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mem_mask is not None:
        scores = jnp.where(mem_mask[:, None, None, :] > 0, scores,
                           jnp.float32(-1e30))
    att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", att, vh)
    return dense(p["out"], _merge_heads(ctx))


def ffn_init(key, d: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {"w1": dense_init(k1, d, hidden), "w2": dense_init(k2, hidden, d)}


def ffn(p, x):
    return dense(p["w2"], jax.nn.relu(dense(p["w1"], x)))


# ---------------------------------------------------------------------------
# LSTM (hotword embedding compiler — model_eb equivalent)
# ---------------------------------------------------------------------------

def lstm_init(key, d_in: int, d_hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        "wx": dense_init(k1, d_in, 4 * d_hidden),
        "wh": dense_init(k2, d_hidden, 4 * d_hidden, bias=False),
    }


def lstm_apply(p, xs):
    """xs: [B, T, Din] -> outputs [B, T, H] via lax.scan."""
    b, t, _ = xs.shape
    h_dim = p["wh"]["w"].shape[0]
    h0 = jnp.zeros((b, h_dim), jnp.float32)
    c0 = jnp.zeros((b, h_dim), jnp.float32)

    def step(carry, x):
        h, c = carry
        gates = dense(p["wx"], x) + dense(p["wh"], h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), xs.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)
