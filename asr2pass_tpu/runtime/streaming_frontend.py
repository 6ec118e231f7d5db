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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
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
    def stage(self, samples: np.ndarray):
        """Phase 1 of a batched accept: absorb samples, return
        (waveform_buffer, n_complete_frames) for an external batched fbank
        call. Follow with commit(mel, is_final). The engine stages every
        slot, runs ONE device fbank over the batch, then commits — per-slot
        device dispatches through a remote-execution tunnel are the
        dominant serving cost otherwise."""
        samples = np.asarray(samples, dtype=np.float32)
        buf = np.concatenate([self._residual, samples])
        n = num_frames(len(buf), self.cfg)
        if n > 0:
            self._residual = buf[n * self.cfg.frame_shift:]
        else:
            self._residual = buf
        return buf, n

    def commit(self, mel: Optional[np.ndarray],
               is_final: bool = False) -> np.ndarray:
        """Phase 2: push externally computed mel rows (stage()'s frame
        count) and emit complete LFR+CMVN windows."""
        if mel is not None and mel.shape[0] > 0:
            if self._mel is None or len(self._mel) == 0:
                self._mel = np.asarray(mel, np.float32)
            else:
                self._mel = np.concatenate([self._mel, mel])
            self._mel_total += mel.shape[0]
        return self._emit(is_final)

    def accept(self, samples: np.ndarray, is_final: bool = False) -> np.ndarray:
        """Feed raw float32 samples; returns newly complete LFR+CMVN rows
        [n, lfr_dim]."""
        buf, n = self.stage(samples)
        mel = self._fbank_chunk(buf) if n > 0 else None
        return self.commit(mel, is_final)

    def _emit(self, is_final: bool) -> np.ndarray:
        cfg = self.cfg
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


_BATCH_POW = [1, 2, 4, 8, 16, 32, 64, 128]


def batched_fbank(bufs, ns, cfg: FrontendConfig, coarse: bool = False):
    """One jitted device fbank for many staged streams.

    bufs: list of float32 waveform buffers (StreamingFrontend.stage
    output), ns: complete-frame counts. Returns the per-stream mel arrays
    [n_i, n_mels]. Batch and frame axes ride shape buckets so jit sees a
    handful of programs. This is the engine's replacement for per-slot
    fbank dispatches — on a remote-execution backend every dispatch is a
    network round-trip, so S streams/tick must cost ONE, not S.

    coarse=True switches the frame axis to power-of-2 buckets (min 128) —
    for offline VAD segments whose lengths span 1-60 s, 25-frame buckets
    would compile ~40 programs; powers of 2 compile ~7."""
    k = len(bufs)
    if k == 0:
        return []
    max_n = max(ns)
    if max_n == 0:
        return [np.zeros((0, cfg.n_mels), np.float32)] * k
    if coarse:
        bucket = 128
        while bucket < max_n:
            bucket *= 2
    else:
        bucket = -(-max_n // _BUCKET) * _BUCKET
    need = cfg.frame_length + (bucket - 1) * cfg.frame_shift
    kb = next((b for b in _BATCH_POW if b >= k), k)
    waves = np.zeros((kb, need), np.float32)
    for i, buf in enumerate(bufs):
        m = min(len(buf), need)
        waves[i, :m] = buf[:m]
    mel = np.asarray(get_extractor(cfg).batched(waves, bucket))
    return [mel[i, : ns[i]] for i in range(k)]


def offline_window_samples(fcfg: FrontendConfig, lfr_bucket: int) -> int:
    """Samples one lfr_bucket window of the offline front-end consumes —
    the ONE place the need arithmetic lives (upload program, ring
    program, and the engine's ring-eligibility check all use it)."""
    return (fcfg.frame_length
            + (lfr_bucket * fcfg.lfr_n - 1) * fcfg.frame_shift)


def _frontend_feats(ex, fcfg: FrontendConfig, b: int, lfr_bucket: int,
                    win, n_mel, means, vars_):
    """Shared traced tail of the fused offline front-end: [b, need]
    int16 windows -> fbank -> LFR gather -> CMVN -> [b, lfr_bucket,
    lfr_dim]. Exact apply_lfr semantics: taps clamped per item to the
    valid mel rows (first-frame left pad + last-frame tail repeat);
    rows past an item's ceil(n/lfr_n) are repeats the model masks.
    `ex` (the fbank extractor) must be constructed OUTSIDE the trace —
    its cached filterbank constants would otherwise leak as tracers."""
    m, n = fcfg.lfr_m, fcfg.lfr_n
    mel_bucket = lfr_bucket * n
    left = (m - 1) // 2
    frame_idx = (np.arange(mel_bucket)[:, None] * fcfg.frame_shift
                 + np.arange(fcfg.frame_length)[None, :])
    lfr_idx = (np.arange(lfr_bucket)[:, None] * n
               + np.arange(m)[None, :] - left)
    frames = win[:, frame_idx].astype(jnp.float32)
    mel = ex.frames_to_mel(
        (frames * (fcfg.scale_input / 32768.0)
         ).reshape(b * mel_bucket, -1)).reshape(b, mel_bucket, -1)
    idx = jnp.clip(jnp.asarray(lfr_idx)[None], 0,
                   jnp.maximum(n_mel - 1, 0)[:, None, None])
    feats = jnp.take_along_axis(
        mel, idx.reshape(b, -1)[:, :, None], axis=1
    ).reshape(b, lfr_bucket, m * fcfg.n_mels)
    return (feats + means) * vars_


@functools.lru_cache(maxsize=64)
def _offline_frontend_prog(fcfg: FrontendConfig, b: int, lfr_bucket: int):
    """One jitted program: int16 audio -> fbank -> LFR gather -> CMVN,
    producing DEVICE feats the pass-2 model consumes directly."""
    need = offline_window_samples(fcfg, lfr_bucket)
    ex = get_extractor(fcfg)

    @jax.jit
    def fn(waves, n_mel, means, vars_):
        return _frontend_feats(ex, fcfg, b, lfr_bucket, waves, n_mel,
                               means, vars_)

    return fn, need


def offline_frontend_device(bufs, ns, lfr_bucket: int,
                            cfg: FrontendConfig, means=None, vars_=None,
                            batch_b: int = None):
    """Device-resident offline front-end for one pass-2 chunk: segments'
    samples upload ONCE as int16 (PCM-grid exact after quantize_pcm) and
    fbank+LFR+CMVN run fused on device, returning the [B, lfr_bucket,
    lfr_dim] feats ARRAY the model forward consumes — nothing comes back
    to the host. Replaces the fetch-mel-then-upload-feats shape of
    offline_frontend_batch on serving paths, whose device->host mel
    traffic (~1.9 s per 256-segment round at the tunnel's ~30 MB/s)
    serialized with the engine tick's fused fetch and collapsed
    steady-state throughput."""
    from asr2pass_tpu.frontend.audio import quantize_pcm

    if batch_b is None:
        batch_b = len(bufs)
    fn, need = _offline_frontend_prog(cfg, batch_b, lfr_bucket)
    waves = np.zeros((batch_b, need), np.int16)
    n_mel = np.zeros(batch_b, np.int32)
    for i, (buf, nf) in enumerate(zip(bufs, ns)):
        k = min(len(buf), need)
        waves[i, :k] = (quantize_pcm(np.asarray(buf[:k], np.float32))
                        * 32768.0).astype(np.int16)
        n_mel[i] = nf
    if means is None:
        means = np.zeros(cfg.lfr_dim, np.float32)
    if vars_ is None:
        vars_ = np.ones(cfg.lfr_dim, np.float32)
    return fn(jnp.asarray(waves), jnp.asarray(n_mel),
              jnp.asarray(means, jnp.float32),
              jnp.asarray(vars_, jnp.float32))


@functools.lru_cache(maxsize=64)
def _ring_frontend_prog(fcfg: FrontendConfig, b: int, lfr_bucket: int,
                        ring_samples: int):
    """Ring variant of _offline_frontend_prog: the segment windows are
    GATHERED from the engine's per-slot device audio ring (written once
    per tick by the fused VAD step) instead of uploading samples — the
    pass-2 lane re-uploaded ~57 MB per 256-segment round of audio the
    device already held. The fbank/LFR/CMVN tail is the SAME traced
    helper as the upload program, so the two paths cannot diverge."""
    need = offline_window_samples(fcfg, lfr_bucket)
    ex = get_extractor(fcfg)

    @jax.jit
    def fn(ring, slot_ids, start_off, n_mel, means, vars_):
        rows = ring[slot_ids]                       # [b, R]
        ext = jnp.concatenate([rows, rows[:, :need]], axis=1)
        win = jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(r, (s,), (need,))
        )(ext, start_off)
        return _frontend_feats(ex, fcfg, b, lfr_bucket, win, n_mel,
                               means, vars_)

    return fn, need


def ring_frontend_device(ring, slot_ids, abs_starts, ns, lfr_bucket: int,
                         cfg: FrontendConfig, means=None, vars_=None,
                         batch_b: int = None):
    """Device feats for segments that still live in the per-slot audio
    ring: fbank+LFR+CMVN over ring-gathered windows — the pass-2 lane
    uploads NOTHING for these. Returns None when the window would not
    fit the ring (caller falls back to offline_frontend_device)."""
    if batch_b is None:
        batch_b = len(slot_ids)
    r = ring.shape[1]
    fn, need = _ring_frontend_prog(cfg, batch_b, lfr_bucket, r)
    if need > r:
        return None
    sl = np.zeros(batch_b, np.int32)
    off = np.zeros(batch_b, np.int32)
    n_mel = np.zeros(batch_b, np.int32)
    for i, (sid, a, nf) in enumerate(zip(slot_ids, abs_starts, ns)):
        sl[i] = sid
        off[i] = a % r
        n_mel[i] = nf
    if means is None:
        means = np.zeros(cfg.lfr_dim, np.float32)
    if vars_ is None:
        vars_ = np.ones(cfg.lfr_dim, np.float32)
    return fn(ring, jnp.asarray(sl), jnp.asarray(off),
              jnp.asarray(n_mel), jnp.asarray(means, jnp.float32),
              jnp.asarray(vars_, jnp.float32))


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
