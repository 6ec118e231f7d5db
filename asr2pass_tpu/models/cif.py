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
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kernel = cfg.l_order + cfg.r_order + 1
    p = {
        # full (non-depthwise) conv over the context window, then relu
        "conv": {
            "w": jax.random.normal(k1, (kernel, cfg.idim, cfg.idim),
                                   jnp.float32) * (1.0 / (kernel * cfg.idim) ** 0.5),
            "b": jnp.zeros((cfg.idim,), jnp.float32),
        },
        "out": dense_init(k2, cfg.idim, 1),
    }
    if cfg.use_timestamp:
        # bicif: 3x transposed-conv upsample + linear head for us_alphas
        p["us_conv"] = {
            "w": jax.random.normal(k3, (cfg.upsample_times, cfg.idim, cfg.idim),
                                   jnp.float32) * (1.0 / cfg.idim ** 0.5),
            "b": jnp.zeros((cfg.idim,), jnp.float32),
        }
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
    """Encoder output [B, T, D] -> firing weights [B, T] in (0, 1)."""
    h = jax.nn.relu(_context_conv(params["conv"], enc, cfg.l_order,
                                  cfg.r_order))
    a = jax.nn.sigmoid(dense(params["out"], h))[..., 0]
    if mask is not None:
        a = a * mask
    return a


def upsampled_alphas(params, enc, cfg: PredictorConfig,
                     mask: Optional[jnp.ndarray] = None):
    """Timestamp (bicif) head: [B, T, D] -> us_alphas [B, T*upsample].

    Role of the 4-output timestamp models (paraformer.cpp:549 us_alphas /
    us_cif_peak outputs)."""
    b, t, d = enc.shape
    up = cfg.upsample_times
    # transposed conv with stride == kernel == upsample_times
    y = jnp.einsum("btd,kde->btke", enc, params["us_conv"]["w"])
    y = y.reshape(b, t * up, d) + params["us_conv"]["b"]
    a = jax.nn.sigmoid(dense(params["us_out"], jax.nn.relu(y)))[..., 0]
    if mask is not None:
        a = a * jnp.repeat(mask, up, axis=-1)
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
        frames * fires[..., None]
    )[:, :max_tokens]
    counts = jnp.minimum(jnp.sum(fires.astype(jnp.int32), axis=1),
                         max_tokens)
    return packed, counts, fires, CifState(integrate=integ, frame=frame)


def fire_offline(hidden, alphas, threshold: float, tail_threshold: float,
                 max_tokens: Optional[int] = None):
    """Offline fire with the tail-fire frame appended (tail_threshold row,
    mirroring CifSearch's is_last_chunk tail handling
    paraformer-online.cpp:295-299)."""
    b, t, d = hidden.shape
    hidden_ext = jnp.concatenate([hidden, jnp.zeros((b, 1, d), hidden.dtype)],
                                 axis=1)
    alphas_ext = jnp.concatenate(
        [alphas, jnp.full((b, 1), tail_threshold, alphas.dtype)], axis=1
    )
    frames, counts, fires, _ = fire(hidden_ext, alphas_ext, threshold,
                                    max_tokens=max_tokens)
    return frames, counts, fires


def peaks_from_alphas(us_alphas, threshold: float = 1.0):
    """us_cif_peak equivalent: 1.0 at fire positions, else 0, via the same
    integrate pass over the upsampled alphas."""
    b, t = us_alphas.shape

    def step(integ, alpha):
        new = integ + alpha
        fired = new >= threshold
        rem = jnp.where(fired, new - threshold, new)
        return rem, fired

    _, fires = jax.lax.scan(step, jnp.zeros((b,), jnp.float32),
                            us_alphas.transpose(1, 0))
    return fires.transpose(1, 0).astype(jnp.float32)
