"""Chunk-incremental fbank + LFR + CMVN with exact offline parity.

Replaces the reference's tangle of waveform/LFR splice caches
(paraformer-online.cpp:119-238, fsmn-vad-online.cpp:11-132) with one
invariant: the concatenation of streaming outputs equals the offline
front-end run on the same audio (minus the tail windows that only finalize
on the last chunk). State is just (residual samples, a trimmed mel ring,
emitted-window counter) — fixed-size, so the engine can batch streams.

Fbank chunks are padded to frame-count buckets so jit sees few shapes
(SURVEY.md §7 "recompilation control"); padding is exact because each mel
frame depends only on its own 400-sample window.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from asr2pass_tpu.config import FrontendConfig
from asr2pass_tpu.frontend.fbank import get_extractor, num_frames

_BUCKET = 25  # frames per jit shape bucket (250 ms)


class StreamingFrontend:
    def __init__(self, cfg: FrontendConfig, cmvn_means=None, cmvn_vars=None):
        self.cfg = cfg
        self.extractor = get_extractor(cfg)
        d = cfg.lfr_dim
        self.means = (np.zeros(d, np.float32) if cmvn_means is None
                      else np.asarray(cmvn_means, np.float32))
        self.vars = (np.ones(d, np.float32) if cmvn_vars is None
                     else np.asarray(cmvn_vars, np.float32))
        self.reset()

    def reset(self):
        self._residual = np.zeros(0, dtype=np.float32)
        self._mel: Optional[np.ndarray] = None   # trimmed buffer
        self._mel_base = 0                       # global index of _mel[0]
        self._mel_total = 0                      # total mel frames produced
        self._next_window = 0                    # next LFR window index
        self._finished = False

    # -- internals --------------------------------------------------------
    def _fbank_chunk(self, samples: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        n = num_frames(len(samples), cfg)
        if n == 0:
            return np.zeros((0, cfg.n_mels), np.float32)
        bucket = -(-n // _BUCKET) * _BUCKET
        need = cfg.frame_length + (bucket - 1) * cfg.frame_shift
        if len(samples) < need:
            samples = np.pad(samples, (0, need - len(samples)))
        mel = np.asarray(self.extractor._compute(samples[:need], bucket))
        return mel[:n]

    def _emit_windows(self, upto: int, tail: bool) -> np.ndarray:
        """Emit LFR windows [_next_window, upto); tail=True clamps missing
        right-context to the last mel frame (offline tail padding)."""
        cfg = self.cfg
        left = (cfg.lfr_m - 1) // 2
        count = upto - self._next_window
        d = cfg.n_mels
        if count <= 0 or self._mel is None or self._mel_total == 0:
            return np.zeros((0, cfg.lfr_dim), np.float32)
        wins = np.arange(self._next_window, upto)[:, None]
        idx = wins * cfg.lfr_n + np.arange(cfg.lfr_m)[None, :] - left
        idx = np.clip(idx, 0, self._mel_total - 1)
        local = idx - self._mel_base
        feats = self._mel[local].reshape(count, cfg.lfr_dim)
        self._next_window = upto
        return (feats + self.means) * self.vars

    # -- public -----------------------------------------------------------
    def accept(self, samples: np.ndarray, is_final: bool = False) -> np.ndarray:
        """Feed raw float32 samples; returns newly complete LFR+CMVN rows
        [n, lfr_dim]."""
        cfg = self.cfg
        samples = np.asarray(samples, dtype=np.float32)
        buf = np.concatenate([self._residual, samples])
        n = num_frames(len(buf), cfg)
        if n > 0:
            mel = self._fbank_chunk(buf)
            self._residual = buf[n * cfg.frame_shift:]
            if self._mel is None or len(self._mel) == 0:
                self._mel = mel
            else:
                self._mel = np.concatenate([self._mel, mel])
            self._mel_total += n
        else:
            self._residual = buf

        left = (cfg.lfr_m - 1) // 2
        if is_final:
            # offline window count: ceil(T / lfr_n), tail repeats last frame
            upto = -(-self._mel_total // cfg.lfr_n)
            out = self._emit_windows(upto, tail=True)
            self.reset()
            return out
        # window i is complete when its last tap i*lfr_n + (lfr_m-1) - left
        # exists
        upto = (self._mel_total - 1 - (cfg.lfr_m - 1) + left) // cfg.lfr_n + 1
        upto = max(upto, 0)
        out = self._emit_windows(upto, tail=False)
        # trim consumed mel frames (next window's earliest tap)
        keep_from = max(self._next_window * cfg.lfr_n - left, 0)
        if self._mel is not None and keep_from > self._mel_base:
            self._mel = self._mel[keep_from - self._mel_base:]
            self._mel_base = keep_from
        return out


def offline_frontend(samples, cfg: FrontendConfig, means=None, vars_=None):
    """One-shot front-end (fbank -> LFR -> CMVN), the offline reference
    path (paraformer.cpp:309-323,421-461). Returns [T_lfr, lfr_dim]."""
    from asr2pass_tpu.frontend.lfr import apply_cmvn, apply_lfr

    ex = get_extractor(cfg)
    mel = np.asarray(ex(np.asarray(samples, np.float32)))
    if mel.shape[0] == 0:
        return np.zeros((0, cfg.lfr_dim), np.float32)
    feats = np.asarray(apply_lfr(mel, cfg.lfr_m, cfg.lfr_n))
    if means is None:
        means = np.zeros(cfg.lfr_dim, np.float32)
    if vars_ is None:
        vars_ = np.ones(cfg.lfr_dim, np.float32)
    return np.asarray(apply_cmvn(feats, means, vars_))
