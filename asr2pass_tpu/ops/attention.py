"""Pallas attention kernels for the SAN-M encoder/decoder.

The offline pass-2 models run attention over VAD segments up to ~1024
LFR frames; unfused XLA attention materializes [B, H, Tq, Tk] fp32
scores in HBM (4 MB per (b,h) at T=1024), making the op HBM-bound —
profiled at ~68 ms of a 112 ms encoder forward at serving shapes.

Three kernels:
  _ss_kernel   — single-shot: one q block vs the FULL key range resident
                 in VMEM; one dot, one softmax, one dot. The default for
                 Tk <= MAX_T_SS, self- (flash_attention) and cross-
                 (cross_flash_attention, decoder ac_embeds x enc) shapes.
  _kernel      — classic online-softmax flash for Tk > MAX_T_SS (the
                 per-k-block rescaling costs VPU time, so it is only the
                 long-sequence fallback).

Used automatically by models/layers.{sanm_attention,cross_attention} on
TPU; the XLA path remains for CPU/short windows (the [5,10,5] streaming
window is 20 frames — kernels are pointless there).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
_NEG = -1e30

# single-shot kernel: q-block rows per program; the full K/V plus one
# [BLOCK_Q_SS, T] fp32 score slab must fit VMEM (~16 MB/core), which
# bounds T at MAX_T_SS
# 0 = adaptive (see _ss_block_q); a positive value forces that block size
BLOCK_Q_SS = int(os.environ.get("ASR2PASS_SS_BLOCK_Q", "0"))
MAX_T_SS = 2048
# split-head single-shot bound: per-(b,h) the kernel holds [Tk, d_head]
# K/V + one [BQ, Tk] score slab, so it stretches 2x past the unsplit
# kernel's [Tk, 2D] bound. Measured on the T=4096 bucket: online-softmax
# fallback 206 ms/forward vs ~37 ms single-shot (the 1.2k vs 6.6k
# audio-s/s cliff in scripts/bench_sp.py's long-T curve).
MAX_T_SS_SPLIT = 4096


def _ss_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale: float):
    """Single-shot attention for one q block against the FULL key range.

    At pass-2 shapes (T<=1024, d_head 128) all of K/V fits VMEM, so the
    flash online-softmax rescaling (per-k-block exp/alpha/acc multiplies —
    pure VPU overhead) is unnecessary: do ONE [BQ, T] score dot, one
    masked softmax, one [BQ, T]x[T, D] context dot. K/V block specs are
    invariant in the q-block grid axis so Mosaic keeps them resident.
    """
    q = q_ref[:]
    s = jax.lax.dot_general(
        q, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(mask_ref[0, :][None, :] > 0, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jnp.dot(p.astype(v_ref.dtype), v_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = (ctx / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _mhss_kernel(q_ref, kv_ref, mask_ref, o_ref, *, heads: int, d: int,
                 sm_scale: float):
    """Multi-head single-shot attention on UNSPLIT projections.

    q_ref: [BQ, D] (heads in contiguous d_k column blocks, the layout
    dense() produces); kv_ref: [Tk, 2D] (K cols then V cols); mask_ref
    [1, Tk]. Heads run sequentially in-kernel over column slices, so the
    [B,T,D]->[B,H,T,d_k] head transposes, the q/k/v splits and the
    context merge that cost ~1/3 of the measured attention time in the
    per-head kernel layout simply do not exist — and only ONE [BQ, Tk]
    fp32 score slab is live at a time, keeping VMEM flat."""
    d_k = d // heads
    valid = mask_ref[0, :][None, :] > 0
    for hh in range(heads):
        q = q_ref[:, hh * d_k:(hh + 1) * d_k]
        k = kv_ref[:, hh * d_k:(hh + 1) * d_k]
        v = kv_ref[:, d + hh * d_k:d + (hh + 1) * d_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(valid, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(p.astype(kv_ref.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[:, hh * d_k:(hh + 1) * d_k] = (
            ctx / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def mh_flash_attention(q, kv, kv_mask, heads: int, interpret: bool = False):
    """Single-shot attention straight off the projection layout.

    q: [B, Tq, D]; kv: [B, Tk, 2D] (K then V columns); kv_mask: [B, Tk]
    (>0 valid). Returns context [B, Tq, D] in merged-head layout (what
    the output projection consumes). Tq may differ from Tk (cross)."""
    b, tq, d = q.shape
    tk = kv.shape[1]
    orig_tq = tq
    # q-block: largest 128-multiple whose fp32 score slab pair fits the
    # VMEM budget alongside [Tk, 2D] K/V
    budget = 6 * 2**20
    bq = max(128, min((budget // (tk * 8)) // 128 * 128, 1024))
    bq = min(bq, -(-tq // 128) * 128)
    padq = (-tq) % bq
    padk = (-tk) % 128
    if padq:
        q = jnp.pad(q, [(0, 0), (0, padq), (0, 0)])
        tq += padq
    if padk:
        kv = jnp.pad(kv, [(0, 0), (0, padk), (0, 0)])
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, padk)])
        tk += padk
    sm_scale = 1.0 / math.sqrt(d // heads)
    maskf = kv_mask[:, None, :]                       # [B, 1, Tk]

    grid = (b, tq // bq)
    out = pl.pallas_call(
        functools.partial(_mhss_kernel, heads=heads, d=d,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk, 2 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, tk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * tq * tk * d,
            bytes_accessed=b * (2 * tq * d + 2 * tk * d) * 2,
            transcendentals=b * tq * tk * heads,
        ),
        interpret=interpret,
    )(q, kv, maskf)
    if padq:
        out = out[:, :orig_tq, :]
    return out


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

    Dispatches to the single-shot kernel when the full per-head key
    range fits VMEM (T <= MAX_T_SS_SPLIT), else the online-softmax flash
    kernel. Fully-masked query rows return 0 (matching the masked XLA
    path after output masking)."""
    if q.shape[2] <= MAX_T_SS_SPLIT:
        return _attention_ss(q, k, v, mask, q_mask=mask,
                             interpret=interpret)
    return _attention_flash(q, k, v, mask, interpret=interpret)


def cross_flash_attention(q, k, v, kv_mask, interpret: bool = False):
    """Single-shot cross-attention: q [B,H,Tq,D] against k/v [B,H,Tk,D]
    with kv_mask [B,Tk]. Same HBM-traffic argument as self-attention —
    the decoder's [B,H,Tq,Tk] fp32 score tensor never leaves VMEM.
    Padded/invalid q rows are NOT zeroed (downstream token masks own
    that, matching the XLA path in layers.cross_attention)."""
    return _attention_ss(q, k, v, kv_mask, q_mask=None, interpret=interpret)


def _ss_block_q(tq: int, tk: int) -> int:
    """Largest q-block that keeps the two [BQ, Tk] fp32 score slabs plus
    K/V resident in VMEM (~16 MB/core, budget ~10 MB for the slabs).

    Bigger blocks mean FEWER grid programs: at b=16 h=4 T=1024 the fixed
    BQ=256 grid ran 256 programs/layer whose per-program overhead (DMA
    turnaround, fixed launch cost) dominated the ~0.7 us of useful MXU
    work each — attention measured ~51 ms/forward vs an ~8 ms FLOP cost
    (scripts/profile_encoder.py). BQ=Tq collapses that to one program per
    (b,h) with K/V fetched exactly once."""
    if BLOCK_Q_SS > 0:          # explicit override for experiments
        return BLOCK_Q_SS
    budget = 10 * 2**20
    bq = (budget // (tk * 8)) // 128 * 128
    bq = max(128, min(bq, 1024))
    # don't pad tq up to a block bigger than the whole query range
    tq_pad = -(-tq // 128) * 128
    return min(bq, tq_pad)


def _attention_ss(q, k, v, kv_mask, q_mask=None, interpret: bool = False):
    """Single-shot (non-online-softmax) attention; see _ss_kernel.

    Supports Tq != Tk (cross-attention). kv_mask: [B, Tk]; if q_mask is
    given, fully-masked query rows are zeroed on the way out."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    orig_tq = tq
    bq = _ss_block_q(tq, tk)
    padq = (-tq) % bq
    padk = (-tk) % 128
    if padq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, padq), (0, 0)])
        tq += padq
    if padk:
        kcfg = [(0, 0), (0, 0), (0, padk), (0, 0)]
        k = jnp.pad(k, kcfg)
        v = jnp.pad(v, kcfg)
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, padk)])
        tk += padk
    sm_scale = 1.0 / math.sqrt(d)
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    maskf = jnp.repeat(kv_mask, h, axis=0)[:, None, :]  # [B*H, 1, Tk]

    grid = (b * h, tq // bq)
    out = pl.pallas_call(
        functools.partial(_ss_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, tk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(b * h) * (2 * tq * d + 2 * tk * d) * 2,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    out = out.reshape(b, h, tq, d)
    if padq:
        out = out[:, :, :orig_tq, :]
    if q_mask is not None:
        out = out * (q_mask[:, None, :orig_tq, None] > 0)
    return out


def _attention_flash(q, k, v, mask, interpret: bool = False):
    """Online-softmax flash kernel for T beyond VMEM capacity."""
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

# Stage profiling (scripts/profile_encoder.py, b=16 T=1000 d=512 bf16 on
# v5e) showed attention costs ~68 ms/forward vs an ~8 ms FLOP estimate —
# XLA's unfused path round-trips the [B,H,T,T] fp32 score tensor through
# HBM (~256 MB/layer), so the encoder IS score-traffic-bound at serving
# shapes. The single-shot VMEM kernel (_ss_kernel) removes that traffic
# and lifted the offline bench 7.5k -> 9.4k audio-s/s/chip. The earlier
# online-softmax flash kernel LOST to XLA (3.6k) because its per-k-block
# exp/alpha/acc rescaling is pure VPU overhead; it remains only as the
# fallback for T > MAX_T_SS. Default ON for TPU; disable with
# ASR2PASS_FLASH_ATTENTION=0.
_FLASH_ENV = "ASR2PASS_FLASH_ATTENTION"
_SCAN_ENV = "ASR2PASS_SCAN_LAYERS"


def flash_enabled() -> bool:
    return os.environ.get(_FLASH_ENV, "1") == "1"


def scan_layers(seq_len=None) -> bool:
    """Layer-stack tracing strategy. Honor ASR2PASS_SCAN_LAYERS if set;
    otherwise scan on TPU when flash attention is enabled AND actually
    reachable at this stack's shapes — scan keeps the Pallas kernel to ONE
    call site (each site is a ~45 s tunnel compile here, no dedupe), while
    unrolled loops compile ~3x faster when there is no Pallas inside (the
    CPU/test default, and streaming models whose chunk windows sit under
    the t>=256 kernel gate).

    seq_len: the attention sequence length at this stack's call sites
    (self-attn t, or min(tq, tk) for cross) — when given and below the
    kernel gate, the stack compiles unrolled."""
    v = os.environ.get(_SCAN_ENV)
    if v is not None:
        return v == "1"
    if seq_len is not None and seq_len < 256:
        return False
    return flash_enabled() and jax.default_backend() == "tpu"


def use_flash(t: int, d_head: int, att_mask) -> bool:
    """Gate for the unsplit-projection single-shot kernel: default-on for
    TPU at segment shapes; no custom mask; T bounded by what fits VMEM
    (mh_flash_attention pins the whole [Tk, 2D] K/V block per program —
    beyond MAX_T_SS the split-head path takes over: per-head single-shot
    to MAX_T_SS_SPLIT, online-softmax streaming beyond)."""
    if not flash_enabled():
        return False
    if att_mask is not None:
        return False
    if t < 256 or t > MAX_T_SS or d_head > 256:
        return False
    return jax.default_backend() == "tpu"


def use_flash_split(t: int, d_head: int, att_mask) -> bool:
    """Long-sequence fallback gate: T beyond the single-shot VMEM bound
    runs the split-head path (flash_attention -> online-softmax kernel)
    rather than XLA, whose [B,H,T,T] score tensor at T>2048 is the exact
    HBM round-trip the kernels exist to avoid."""
    if not flash_enabled():
        return False
    if att_mask is not None:
        return False
    if t <= MAX_T_SS or d_head > 256:
        return False
    return jax.default_backend() == "tpu"


def use_flash_cross(tq: int, tk: int, d_head: int) -> bool:
    """Single-shot cross-attention gate: key range must fit VMEM, and
    shapes must be big enough that score HBM traffic (not dispatch)
    dominates — streaming decoder chunks (tiny Tq) stay on XLA."""
    if not flash_enabled():
        return False
    if tk > MAX_T_SS or d_head > 256:
        return False
    if tq < 256 or tk < 256:
        return False
    return jax.default_backend() == "tpu"
