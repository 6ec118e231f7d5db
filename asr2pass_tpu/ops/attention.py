"""Pallas flash attention for the SAN-M encoder's self-attention.

The offline pass-2 encoder runs full attention over VAD segments up to
~1024 LFR frames; unfused XLA attention materializes [B, H, T, T] fp32
scores in HBM (4 MB per (b,h) at T=1024), making the op HBM-bound. This
kernel computes the online-softmax attention blockwise in VMEM (the
standard flash algorithm): q blocks stream against k/v blocks, carrying
running (max, sum, acc) — no score matrix ever leaves VMEM.

Used automatically by models/layers.sanm_attention for long sequences on
TPU; the XLA path remains for CPU/short windows (the [5,10,5] streaming
window is 20 frames — flash is pointless there).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
            sm_scale: float):
    # q_ref: [BLOCK_Q, D]; k_ref/v_ref: [T, D]; mask_ref: [1, T]
    # MXU dots take the serving dtype (bf16) directly and accumulate fp32
    # (fp32 MXU passes run at a fraction of bf16 rate); only the softmax
    # statistics stay fp32.
    q = q_ref[:]
    t = k_ref.shape[0]
    d = q_ref.shape[1]
    nblocks = t // block_k

    m = jnp.full((BLOCK_Q, 1), _NEG, jnp.float32)
    l = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc = jnp.zeros((BLOCK_Q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        valid = mask_ref[0, pl.ds(i * block_k, block_k)] > 0
        s = jnp.where(valid[None, :], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(q, k, v, mask, interpret: bool = False):
    """q,k,v: [B, H, T, D]; mask: [B, T] (>0 valid). Returns [B, H, T, D].

    Fully-masked query rows return 0 (matching the masked XLA path after
    output masking)."""
    b, h, t, d = q.shape
    orig_t = t
    pad = (-t) % max(BLOCK_Q, BLOCK_K)
    if pad:
        cfg = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
        mask = jnp.pad(mask, [(0, 0), (0, pad)])
        t = t + pad
    sm_scale = 1.0 / math.sqrt(d)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    maskf = jnp.repeat(mask, h, axis=0)[:, None, :]  # [B*H, 1, T]

    grid = (b * h, t // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=BLOCK_K, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    out = out.reshape(b, h, t, d)
    if pad:
        out = out[:, :, :orig_t, :]
    # zero fully-masked rows (their softmax denominator was 0)
    out = out * (mask[:, None, :orig_t, None] > 0)
    return out


import os

# Opt-in: at the pass-2 shapes (T<=1024, d_head 128) XLA's fused batched
# GEMM attention outperforms this kernel on v5e even with bf16 MXU dots
# (measured: 7.5k XLA vs 3.6k flash audio-s/s/chip at b=16 — the per-
# q-block [128,128] dots underutilize the MXU pipeline, while XLA batches
# all (b,h) into large GEMMs). Profiling shows the encoder is matmul-
# bound, not score-traffic-bound, at these shapes. The kernel pays off
# for much longer sequences (sequence-parallel offline segments);
# enable with ASR2PASS_FLASH_ATTENTION=1.
_FLASH_ENV = "ASR2PASS_FLASH_ATTENTION"


def use_flash(t: int, d_head: int, att_mask) -> bool:
    """Opt-in via env; long sequences, TPU backend, no custom mask."""
    if os.environ.get(_FLASH_ENV, "0") != "1":
        return False
    if att_mask is not None:
        return False
    if t < 256 or d_head > 256:
        return False
    return jax.default_backend() == "tpu"
