"""Kaldi-compatible log-mel fbank, formulated for the TPU MXU.

Semantics follow kaldi-native-fbank as configured by the reference
(onnxruntime/src/paraformer.cpp:24-31,309-323: dither=0, energy_floor=0,
waveform pre-scaled by 32768, snip_edges default true): per frame —
remove DC offset, preemphasis 0.97, window (hamming/povey), zero-pad to the
next power of two, power spectrum, mel-triangular bins (low 20 Hz, high at
nyquist), natural log with float-epsilon floor.

TPU-first design: instead of an FFT (awkward shapes for XLA on short frames),
the power spectrum is computed as two dense matmuls with precomputed DFT
cos/sin matrices folded together with the mel filterbank where possible.
Framing is a gather-free reshape via strided slicing; everything is jittable
with static shapes and batches over frames on the MXU:

    frames[N,400] @ C[400,257] -> re ; frames @ S[400,257] -> im
    power = re^2 + im^2 ; logmel = log(power @ M[257,80])

For a 512-point DFT that is 2*400*512 flops/frame on the MXU — far below the
memory-bound roofline, so fbank is effectively free compared with the encoder.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import FrontendConfig

_EPS = float(np.finfo(np.float32).eps)


def num_frames(num_samples: int, cfg: FrontendConfig) -> int:
    """Frame count with snip_edges=true (kaldi feature-window semantics)."""
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def _feature_window(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    w = cfg.window.lower()
    if w == "hanning" or w == "hann":
        win = 0.5 - 0.5 * np.cos(a * i)
    elif w == "hamming":
        win = 0.54 - 0.46 * np.cos(a * i)
    elif w == "povey":
        win = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif w == "rectangular":
        win = np.ones(n)
    elif w == "blackman":
        win = 0.42 - 0.5 * np.cos(a * i) + 0.08 * np.cos(2 * a * i)
    else:
        raise ValueError(f"unknown window type {cfg.window}")
    return win.astype(np.float64)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """Kaldi MelBanks triangular weights over FFT bins [n_fft//2, n_mels]."""
    n_fft = cfg.n_fft
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * cfg.fs
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low = mel_scale(cfg.low_freq)
    mel_high = mel_scale(high)
    delta = (mel_high - mel_low) / (cfg.n_mels + 1)
    fft_freqs = np.arange(num_fft_bins) * (cfg.fs / n_fft)
    mel_freqs = mel_scale(fft_freqs)
    bank = np.zeros((num_fft_bins, cfg.n_mels), dtype=np.float64)
    for m in range(cfg.n_mels):
        left = mel_low + m * delta
        center = mel_low + (m + 1) * delta
        right = mel_low + (m + 2) * delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        weights = np.minimum(up, down)
        bank[:, m] = np.maximum(0.0, weights)
    return bank


def _dft_matrices(cfg: FrontendConfig):
    """Real-DFT cos/sin matrices restricted to the first frame_length rows
    (the zero padding contributes nothing) and n_fft//2 frequency bins."""
    n_fft = cfg.n_fft
    k = np.arange(n_fft // 2)
    n = np.arange(cfg.frame_length)
    ang = 2.0 * math.pi * np.outer(n, k) / n_fft
    return np.cos(ang), -np.sin(ang)


class FbankExtractor:
    """Batched jit-compiled fbank. Call with float32 waveform in [-1, 1]."""

    def __init__(self, cfg: FrontendConfig):
        self.cfg = cfg
        win = _feature_window(cfg)
        cosm, sinm = _dft_matrices(cfg)
        melm = mel_filterbank(cfg)
        # fold the window into the DFT matrices: (x*win) @ C == x @ (win*C)
        self._cos = jnp.asarray(win[:, None] * cosm, dtype=jnp.float32)
        self._sin = jnp.asarray(win[:, None] * sinm, dtype=jnp.float32)
        self._mel = jnp.asarray(melm, dtype=jnp.float32)
        self._win = jnp.asarray(win, dtype=jnp.float32)

    def frames_to_mel(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[N, frame_length] raw (already x32768) frames -> [N, n_mels]."""
        cfg = self.cfg
        x = frames.astype(jnp.float32)
        if cfg.remove_dc_offset:
            x = x - jnp.mean(x, axis=-1, keepdims=True)
        if cfg.preemphasis != 0.0:
            prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=-1)
            x = x - cfg.preemphasis * prev
        # full fp32 MXU precision: feature extraction feeds a log, bf16
        # mantissa error there is audible in CER
        hi = jax.lax.Precision.HIGHEST
        re = jnp.dot(x, self._cos, precision=hi,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(x, self._sin, precision=hi,
                     preferred_element_type=jnp.float32)
        power = re * re + im * im
        mel = jnp.dot(power, self._mel, precision=hi,
                      preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(mel, _EPS))

    def _frame(self, wave: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        cfg = self.cfg
        idx = (
            np.arange(n_frames)[:, None] * cfg.frame_shift
            + np.arange(cfg.frame_length)[None, :]
        )
        return wave[idx]

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _compute(self, wave: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        frames = self._frame(wave * self.cfg.scale_input, n_frames)
        return self.frames_to_mel(frames)

    def __call__(self, wave) -> jnp.ndarray:
        """[T] float32 waveform -> [num_frames, n_mels] log-mel features."""
        wave = jnp.asarray(wave, dtype=jnp.float32)
        n = num_frames(int(wave.shape[0]), self.cfg)
        if n == 0:
            return jnp.zeros((0, self.cfg.n_mels), dtype=jnp.float32)
        return self._compute(wave, n)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _compute_batched(self, waves: jnp.ndarray,
                         n_frames: int) -> jnp.ndarray:
        frames = jax.vmap(
            lambda w: self._frame(w * self.cfg.scale_input, n_frames)
        )(waves)
        b = frames.shape[0]
        mel = self.frames_to_mel(frames.reshape(b * n_frames, -1))
        return mel.reshape(b, n_frames, -1)

    def batched(self, waves: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        """[B, T] equal-length waveforms -> [B, n_frames, n_mels] in one
        compiled program (one MXU matmul over B*n_frames windows)."""
        waves = jnp.asarray(waves, dtype=jnp.float32)
        return self._compute_batched(waves, n_frames)


@functools.lru_cache(maxsize=8)
def get_extractor(cfg: FrontendConfig) -> FbankExtractor:
    return FbankExtractor(cfg)
