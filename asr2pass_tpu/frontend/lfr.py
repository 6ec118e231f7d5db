"""Low-frame-rate stacking (LFR) + CMVN.

Matches the reference offline path (paraformer.cpp:421-461 / fsmn-vad.cpp
:198-238): pad (lfr_m-1)//2 copies of the first frame, stack lfr_m frames
every lfr_n, pad the tail by repeating the last frame, then apply the
kaldi-nnet CMVN affine (x + mean) * var element-wise on the stacked vector.
"""
from __future__ import annotations

import math

import numpy as np


def lfr_len(t: int, lfr_m: int, lfr_n: int) -> int:
    """Output length for a t-frame input (ceil(t / lfr_n))."""
    return int(math.ceil(t / lfr_n))


def apply_lfr(feats, lfr_m: int, lfr_n: int):
    """[T, D] mel frames -> [ceil(T/lfr_n), D*lfr_m] stacked frames.

    Host numpy on purpose: this is O(T*D) gather/elementwise glue between
    the device fbank and the device encoder — an eager jnp version costs a
    device dispatch (a network round-trip on remote-execution backends)
    per call."""
    feats = np.asarray(feats)
    t, d = feats.shape
    if t == 0:
        return np.zeros((0, d * lfr_m), dtype=feats.dtype)
    t_lfr = lfr_len(t, lfr_m, lfr_n)
    left = (lfr_m - 1) // 2
    # index of source frame for window i, tap j: i*lfr_n + j - left, clamped
    idx = (
        np.arange(t_lfr)[:, None] * lfr_n
        + np.arange(lfr_m)[None, :]
        - left
    )
    idx = np.clip(idx, 0, t - 1)
    return feats[idx].reshape(t_lfr, d * lfr_m)


def apply_cmvn(feats, means, vars_):
    """(x + mean) * var, kaldi-nnet AddShift/Rescale semantics
    (paraformer.cpp:454-459)."""
    return (np.asarray(feats) + np.asarray(means)) * np.asarray(vars_)


def lfr_cmvn(feats, lfr_m: int, lfr_n: int, means, vars_):
    return apply_cmvn(apply_lfr(feats, lfr_m, lfr_n), means, vars_)
