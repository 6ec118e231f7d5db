"""Streaming Paraformer: one jitted, batched chunk step over explicit state.

TPU-native inversion of the reference's per-connection streaming model
(onnxruntime/src/paraformer-online.cpp): all per-stream caches — the
[lookback+lookahead] feature window cache, absolute pos-emb index, CIF
(integrate, frame) remainder, per-layer decoder FSMN caches — become
leading-axis-batched arrays in an `OnlineState` pytree, so S concurrent
streams advance through ONE `step` call per 600 ms chunk (SURVEY.md §2.5:
"batch S streams per chip per step; per-stream caches as batched state").

Chunk geometry (chunk_size = [lookback, center, lookahead] = [5,10,5] LFR
frames): each step consumes `center` new feature frames; the attention
window is [cache(lookback+lookahead) | new(center)]; CIF alphas are masked
to the emit region so every global frame fires exactly once:
  non-final: window positions [lookback, lookback + C)
  final:     window positions [lookback, lookback + lookahead + C) + tail
(the reference achieves the same coverage with its first/last-chunk special
cases, paraformer-online.cpp:525-601; here the dynamic mask subsumes them).
"""
from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import ParaformerConfig
from asr2pass_tpu.models import cif, sanm_decoder, sanm_encoder
from asr2pass_tpu.models.layers import length_mask


class OnlineState(NamedTuple):
    feats_cache: jnp.ndarray   # [B, lookback+lookahead, lfr_dim] (pos-embedded)
    pos: jnp.ndarray           # [B] absolute LFR frame index consumed
    cif_integrate: jnp.ndarray  # [B]
    cif_frame: jnp.ndarray      # [B, D]
    dec_caches: jnp.ndarray     # [L, B, lorder, D] stacked FSMN caches


def init_state(params, cfg: ParaformerConfig, batch: int) -> OnlineState:
    cache_len = cfg.chunk_size[0] + cfg.chunk_size[2]
    d = cfg.encoder.output_size
    return OnlineState(
        feats_cache=jnp.zeros((batch, cache_len, cfg.frontend.lfr_dim),
                              jnp.float32),
        pos=jnp.zeros((batch,), jnp.int32),
        cif_integrate=jnp.zeros((batch,), jnp.float32),
        cif_frame=jnp.zeros((batch, d), jnp.float32),
        dec_caches=sanm_decoder.init_caches(params["decoder"], batch),
    )


def _posenc_batch(pos_start, length: int, depth: int):
    """Per-stream absolute sinusoidal pos-emb: [B, length, depth]."""
    log_inc = math.log(10000.0) / (depth // 2 - 1)
    inv = jnp.exp(jnp.arange(depth // 2, dtype=jnp.float32) * -log_inc)
    positions = (pos_start[:, None].astype(jnp.float32)
                 + jnp.arange(1, length + 1, dtype=jnp.float32)[None, :])
    scaled = positions[:, :, None] * inv[None, None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


def step(params, cfg: ParaformerConfig, state: OnlineState,
         new_feats: jnp.ndarray, new_count: jnp.ndarray,
         is_final: jnp.ndarray
         ) -> Tuple[OnlineState, jnp.ndarray, jnp.ndarray]:
    """One streaming chunk for all streams.

    new_feats: [B, C, lfr_dim] right-padded new LFR+CMVN frames (C = center
    + lookahead max for the final flush; normally C = center).
    new_count: [B] valid new frames; is_final: [B] bool final-flush flags.
    Returns (new_state, token_ids [B, U], token_counts [B]).
    """
    lookback, center, lookahead = cfg.chunk_size
    cache_len = lookback + lookahead
    b, c, lfr_dim = new_feats.shape
    d = cfg.encoder.output_size

    # scale + absolute positional encoding on the new frames only
    fmask = length_mask(new_count, c)
    x = new_feats * math.sqrt(d) + _posenc_batch(state.pos, c, lfr_dim)
    x = x * fmask[..., None]

    window = jnp.concatenate([state.feats_cache, x], axis=1)  # [B, W, lfr]
    w = window.shape[1]
    wlen = cache_len + new_count
    wmask = length_mask(wlen, w)

    # serve in the params' dtype: the fp32 feats/pos-emb state carries
    # full precision across chunks, but the NN itself should ride the
    # bf16 MXU path like the offline model (state stays fp32)
    pdt = jax.tree.leaves(params)[0].dtype
    enc = sanm_encoder.apply(params["encoder"], window.astype(pdt), wmask,
                             add_posenc=False, d_model=d,
                             heads=cfg.encoder.attention_heads)

    alphas = cif.alphas_head(params["predictor"], enc, cfg.predictor, wmask)
    # emit-region mask; window pos p holds global frame (pos - cache_len
    # + p), so on early chunks also exclude positions before frame 0 (the
    # zero-initialized cache region must never fire)
    ar = jnp.arange(w)[None, :]
    hi = jnp.where(is_final, cache_len + new_count, lookback + new_count)
    lo = jnp.maximum(lookback, cache_len - state.pos)
    emit = (ar >= lo[:, None]) & (ar < hi[:, None])
    alphas = alphas * emit.astype(jnp.float32)
    # tail fire on final streams: one extra slot
    tail_a = jnp.where(is_final, cfg.predictor.tail_threshold, 0.0)
    alphas_ext = jnp.concatenate([alphas, tail_a[:, None]], axis=1)
    hidden_ext = jnp.concatenate([enc, jnp.zeros((b, 1, d), enc.dtype)],
                                 axis=1)

    cif_state = cif.CifState(integrate=state.cif_integrate,
                             frame=state.cif_frame)
    frames, counts, _, cif_state = cif.fire(
        hidden_ext, alphas_ext, cfg.predictor.threshold, cif_state
    )

    tok_mask = length_mask(counts, frames.shape[1])
    logits, new_caches = sanm_decoder.apply_streaming(
        params["decoder"], frames, enc, state.dec_caches,
        enc_mask=wmask, mask=tok_mask, valid_len=counts,
        heads=cfg.decoder.attention_heads,
    )
    ids = jnp.argmax(logits, axis=-1)

    # next feats cache = last (lookback+lookahead) VALID window frames
    idx = (wlen[:, None] - cache_len) + jnp.arange(cache_len)[None, :]
    idx = jnp.maximum(idx, 0)
    new_cache = jnp.take_along_axis(window, idx[..., None], axis=1)

    # final streams reset their state for the next utterance
    fin = is_final
    zero = init_state(params, cfg, b)
    new_state = OnlineState(
        feats_cache=jnp.where(fin[:, None, None], zero.feats_cache, new_cache),
        pos=jnp.where(fin, zero.pos, state.pos + new_count),
        cif_integrate=jnp.where(fin, zero.cif_integrate, cif_state.integrate),
        cif_frame=jnp.where(fin[:, None], zero.cif_frame, cif_state.frame),
        dec_caches=jnp.where(fin[None, :, None, None],
                             zero.dec_caches, new_caches),
    )
    return new_state, ids, counts


@functools.partial(jax.jit, static_argnums=(1,))
def step_jit(params, cfg: ParaformerConfig, state, new_feats, new_count,
             is_final):
    return step(params, cfg, state, new_feats, new_count, is_final)
