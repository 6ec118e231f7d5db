"""CIF — continuous integrate-and-fire predictor, as an XLA-friendly scan.

Role-equivalent to the predictor inside the reference's ONNX graphs plus the
incremental C++ CifSearch (paraformer-online.cpp:270-345): a light conv+
linear+sigmoid head produces per-frame firing weights ``alphas``; the
integrate-and-fire pass accumulates weighted encoder frames and emits one
acoustic embedding per threshold crossing.

TPU design: the fire pass is a single ``lax.scan`` over time with a
fixed-shape scatter of fired frames (sigmoid alphas < 1 ⇒ at most one fire
per frame, so [B, T, D] output buffers are static). The streaming variant
carries (integrate, frame-accumulator) across chunks exactly like the C++
hidden/alphas caches, making streaming == offline when fed the same alphas.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import PredictorConfig
from asr2pass_tpu.models.layers import dense, dense_init, fsmn_init


def init(key, cfg: PredictorConfig):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    kernel = cfg.l_order + cfg.r_order + 1
    p = {
        # full (non-depthwise) conv over the context window (cif_conv1d)
        "conv": {
            "w": jax.random.normal(k1, (kernel, cfg.idim, cfg.idim),
                                   jnp.float32) * (1.0 / (kernel * cfg.idim) ** 0.5),
            "b": jnp.zeros((cfg.idim,), jnp.float32),
        },
        "out": dense_init(k2, cfg.idim, 1),
    }
    if cfg.use_timestamp:
        # bicif (CifPredictorV3): 3x transposed-conv upsample over the
        # SHARED cif conv features -> BLSTM -> linear head for us_alphas
        from asr2pass_tpu.models.layers import lstm_init

        p["us_cnn"] = {
            "w": jax.random.normal(k3, (cfg.upsample_times, cfg.idim, cfg.idim),
                                   jnp.float32) * (1.0 / cfg.idim ** 0.5),
            "b": jnp.zeros((cfg.idim,), jnp.float32),
        }
        half = cfg.idim // 2
        p["blstm"] = {"fw": lstm_init(k5, cfg.idim, half),
                      "bw": lstm_init(k6, cfg.idim, half)}
        p["us_out"] = dense_init(k4, cfg.idim, 1)
    return p


def _context_conv(p, x, l_order: int, r_order: int):
    kernel = l_order + r_order + 1
    pad = jnp.pad(x, ((0, 0), (l_order, r_order), (0, 0)))
    t = x.shape[1]
    out = None
    for k in range(kernel):
        y = jnp.dot(pad[:, k: k + t, :], p["w"][k].astype(x.dtype))
        out = y if out is None else out + y
    return out + p["b"].astype(x.dtype)


def alphas_head(params, enc, cfg: PredictorConfig,
                mask: Optional[jnp.ndarray] = None):
    """Encoder output [B, T, D] -> firing weights [B, T].

    FunASR CifPredictorV2/V3 semantics: relu(conv(x) + x) -> linear ->
    sigmoid -> relu(a * smooth_factor - noise_threshold), masked."""
    h = jax.nn.relu(_context_conv(params["conv"], enc, cfg.l_order,
                                  cfg.r_order) + enc)
    a = jax.nn.sigmoid(dense(params["out"], h))[..., 0]
    a = jax.nn.relu(a * cfg.smooth_factor - cfg.noise_threshold)
    if mask is not None:
        a = a * mask
    return a


def upsampled_alphas(params, enc, cfg: PredictorConfig,
                     mask: Optional[jnp.ndarray] = None,
                     token_num: Optional[jnp.ndarray] = None):
    """Timestamp (bicif) head: [B, T, D] -> us_alphas [B, T*upsample].

    CifPredictorV3.get_upsample_timestmap semantics: the upsample input is
    relu(cif_conv1d(enc)) (shared conv, NO residual here), 3x transposed
    conv, BLSTM, linear+sigmoid, relu(a*smooth2 - noise2), masked, then
    rescaled so the alphas sum to token_num per row. Role of the 4-output
    timestamp models (paraformer.cpp:549 us_alphas / us_cif_peak)."""
    from asr2pass_tpu.models.layers import lstm_apply

    b, t, d = enc.shape
    up = cfg.upsample_times
    h = jax.nn.relu(_context_conv(params["conv"], enc, cfg.l_order,
                                  cfg.r_order))
    # transposed conv with stride == kernel == upsample_times
    y = jnp.einsum("btd,kde->btke", h, params["us_cnn"]["w"])
    y = y.reshape(b, t * up, d) + params["us_cnn"]["b"]
    fw = lstm_apply(params["blstm"]["fw"], y)
    bw = lstm_apply(params["blstm"]["bw"], y[:, ::-1, :])[:, ::-1, :]
    y = jnp.concatenate([fw, bw], axis=-1)
    a = jax.nn.sigmoid(dense(params["us_out"], y))[..., 0]
    a = jax.nn.relu(a * cfg.smooth_factor2 - cfg.noise_threshold2)
    if mask is not None:
        a = a * jnp.repeat(mask, up, axis=-1)
    if token_num is not None:
        total = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-6)
        a = a * (token_num.astype(jnp.float32)[:, None] / total)
    return a


class CifState(NamedTuple):
    """Streaming carry across chunks (hidden_cache_/alphas_cache_ role)."""

    integrate: jnp.ndarray  # [B]
    frame: jnp.ndarray      # [B, D] weighted accumulation since last fire


def zero_state(batch: int, d: int) -> CifState:
    return CifState(
        integrate=jnp.zeros((batch,), jnp.float32),
        frame=jnp.zeros((batch, d), jnp.float32),
    )


def fire(hidden, alphas, threshold: float,
         state: Optional[CifState] = None,
         max_tokens: Optional[int] = None
         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, CifState]:
    """Integrate-and-fire.

    hidden: [B, T, D], alphas: [B, T] (zeroed where masked/padded).
    Returns (frames [B, U, D] fired embeddings packed to the front,
    fire-counts [B], fires [B, T] bool per-step flags, new_state).

    max_tokens bounds the packed token buffer U (default T — the
    theoretical max of one fire per frame). Trained predictors fire ~1
    token per 3+ LFR frames, so the pass-2 pipeline caps U ≈ T/2 to halve
    decoder FLOPs; overflow tokens clamp into the guard slot and counts
    saturate at max_tokens.
    """
    b, t, d = hidden.shape
    if max_tokens is None:
        max_tokens = t
    if state is None:
        state = zero_state(b, d)

    def step(carry, xs):
        integ, frame = carry
        alpha, h = xs
        new_integ = integ + alpha
        fired = new_integ >= threshold
        dist = jnp.where(fired, threshold - integ, alpha)
        out_frame = frame + dist[:, None] * h
        rem = jnp.where(fired, new_integ - threshold, new_integ)
        next_frame = jnp.where(
            fired[:, None], (new_integ - threshold)[:, None] * h, out_frame
        )
        return (rem, next_frame), (fired, out_frame)

    (integ, frame), (fires, frames) = jax.lax.scan(
        step, (state.integrate, state.frame),
        (alphas.transpose(1, 0), hidden.transpose(1, 0, 2)),
    )
    fires = fires.transpose(1, 0)           # [B, T]
    frames = frames.transpose(1, 0, 2)      # [B, T, D] (valid where fired)
    # pack fired frames to the front of the token axis
    idx = jnp.cumsum(fires.astype(jnp.int32), axis=1) - 1
    idx = jnp.where(fires, jnp.minimum(idx, max_tokens), max_tokens)
    packed = jnp.zeros((b, max_tokens + 1, d), hidden.dtype)
    packed = packed.at[jnp.arange(b)[:, None], idx].add(
        (frames * fires[..., None]).astype(packed.dtype)
    )[:, :max_tokens]
    counts = jnp.minimum(jnp.sum(fires.astype(jnp.int32), axis=1),
                         max_tokens)
    return packed, counts, fires, CifState(integrate=integ, frame=frame)


def fire_offline(hidden, alphas, threshold: float, tail_threshold: float,
                 max_tokens: Optional[int] = None, lengths=None):
    """Offline fire with the tail-fire alpha appended (tail_process_fn role,
    mirroring CifSearch's is_last_chunk tail handling
    paraformer-online.cpp:295-299).

    When `lengths` [B] is given the tail alpha lands at each row's first
    padding position (FunASR tail_process_fn mask trick) and hidden is
    zeroed beyond the valid length, so the tail fire flushes the remainder
    without adding content — identical to FunASR's batch=1 semantics for
    every row of a padded batch."""
    b, t, d = hidden.shape
    hidden_ext = jnp.concatenate([hidden, jnp.zeros((b, 1, d), hidden.dtype)],
                                 axis=1)
    if lengths is None:
        alphas_ext = jnp.concatenate(
            [alphas, jnp.full((b, 1), tail_threshold, alphas.dtype)], axis=1
        )
    else:
        tail_pos = jnp.minimum(lengths.astype(jnp.int32), t)
        alphas_ext = jnp.pad(alphas, ((0, 0), (0, 1)))
        alphas_ext = alphas_ext.at[jnp.arange(b), tail_pos].add(
            jnp.asarray(tail_threshold, alphas.dtype))
        valid = (jnp.arange(t + 1)[None, :] < tail_pos[:, None])
        hidden_ext = hidden_ext * valid[..., None].astype(hidden_ext.dtype)
    frames, counts, fires, _ = fire(hidden_ext, alphas_ext, threshold,
                                    max_tokens=max_tokens)
    return frames, counts, fires


def peaks_from_alphas(us_alphas, threshold: float = 1.0):
    """us_cif_peak equivalent (FunASR cif_wo_hidden): the pre-reset
    integrate trace — value >= threshold marks a fire position. Downstream
    (text/timestamps.timestamp_from_peaks, matching util.cpp:838-963)
    tests `peak > 1 - 1e-4`, so callers pass threshold - 1e-4."""
    b, t = us_alphas.shape

    def step(integ, alpha):
        new = integ + alpha
        rem = jnp.where(new >= threshold, new - threshold, new)
        return rem, new

    _, trace = jax.lax.scan(step, jnp.zeros((b,), jnp.float32),
                            us_alphas.transpose(1, 0))
    return trace.transpose(1, 0)
