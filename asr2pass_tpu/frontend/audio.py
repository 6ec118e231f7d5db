"""Audio IO: WAV/PCM parsing, resampling, CMVN file parsing.

Host-side equivalents of the reference audio engine
(onnxruntime/src/audio.cpp:38-116 RIFF parse, resample.cpp Kaldi
LinearResample, paraformer.cpp:325-360 am.mvn parse). FFmpeg any-format
decode is delegated to the ffmpeg CLI when present (the reference links
libav directly; here a subprocess keeps the dependency optional).
"""
from __future__ import annotations

import io
import shutil
import struct
import subprocess
import wave
from typing import Tuple

import numpy as np


def load_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Parse a RIFF/WAV byte buffer -> (float32 mono waveform in [-1,1], fs).

    Reference parses a 44-byte canonical header (audio.cpp:38-116); here the
    stdlib wave module handles chunked headers too.
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        fs = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, fs


def load_pcm_bytes(data: bytes) -> np.ndarray:
    """s16le PCM bytes -> float32 waveform in [-1,1] (audio.cpp s16->f32)."""
    n = len(data) // 2 * 2
    return np.frombuffer(data[:n], dtype="<i2").astype(np.float32) / 32768.0


def quantize_pcm(x) -> np.ndarray:
    """Snap a float waveform to the 16-bit PCM grid (k/32768).

    Real serving input IS s16le PCM, for which this is a bit-exact no-op;
    synthetic/resampled floats quantize once at the feed boundary so the
    engine can stage uploads as int16 (HALF the host->device bytes — the
    tick is upload-bandwidth-bound on tunnel backends) while staying
    bit-identical to the float reference paths."""
    x = np.asarray(x, np.float32)
    return np.clip(np.round(x * 32768.0), -32768, 32767) / np.float32(32768.0)


def ffmpeg_decode(path_or_bytes, fs: int = 16000) -> np.ndarray:
    """Any-format decode via the ffmpeg CLI to mono s16 at `fs`
    (equivalent of audio.cpp:286-446 FfmpegLoad)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not available")
    if isinstance(path_or_bytes, (bytes, bytearray)):
        args = ["ffmpeg", "-nostdin", "-i", "pipe:0"]
        inp = bytes(path_or_bytes)
    else:
        args = ["ffmpeg", "-nostdin", "-i", str(path_or_bytes)]
        inp = None
    args += ["-f", "s16le", "-acodec", "pcm_s16le", "-ac", "1",
             "-ar", str(fs), "pipe:1"]
    out = subprocess.run(args, input=inp, capture_output=True, check=True)
    return load_pcm_bytes(out.stdout)


def load_audio_file(path: str, fs: int = 16000) -> np.ndarray:
    """Load a wav (native) or any other format (ffmpeg) as float32 @ fs."""
    if str(path).endswith(".pcm"):
        with open(path, "rb") as f:
            return load_pcm_bytes(f.read())
    if str(path).endswith(".wav"):
        with open(path, "rb") as f:
            x, in_fs = load_wav_bytes(f.read())
        if in_fs != fs:
            x = linear_resample(x, in_fs, fs)
        return x
    return ffmpeg_decode(path, fs)


# ---------------------------------------------------------------------------
# Linear (windowed-sinc) resampler — Kaldi LinearResample semantics
# (onnxruntime/src/resample.cpp): cutoff = 0.99 * 0.5 * min(fs_in, fs_out),
# num_zeros = 6, Hann-windowed sinc, output length = ceil(n * out/in) at the
# sample instants t = k / fs_out.
# ---------------------------------------------------------------------------

def _hann_sinc_filter(t, cutoff, window_width):
    """Windowed sinc h(t) evaluated at time offsets t (seconds)."""
    t = np.asarray(t, dtype=np.float64)
    inside = np.abs(t) < window_width
    win = np.where(
        inside, 0.5 * (1.0 + np.cos(np.pi * t / window_width)), 0.0
    )
    # sin(2 pi cutoff t) / (pi t), limit 2*cutoff at t=0
    tiny = np.abs(t) < 1e-12
    safe_t = np.where(tiny, 1.0, t)
    sinc = np.where(
        tiny, 2.0 * cutoff, np.sin(2 * np.pi * cutoff * safe_t) / (np.pi * safe_t)
    )
    return win * sinc


def linear_resample(x: np.ndarray, fs_in: int, fs_out: int,
                    num_zeros: int = 6) -> np.ndarray:
    """Rational-rate windowed-sinc resampling of a whole utterance.

    Uses the native C++ kernel when built (asr2pass_tpu/native); this numpy
    path is the reference implementation and fallback."""
    if fs_in == fs_out:
        return np.asarray(x, dtype=np.float32)
    try:
        from asr2pass_tpu.native import bindings

        if bindings.available():
            out = bindings.resample(np.asarray(x, np.float32), fs_in, fs_out,
                                    num_zeros)
            if out is not None:
                return out
    except Exception:
        pass
    x = np.asarray(x, dtype=np.float64)
    n_in = x.shape[0]
    g = np.gcd(fs_in, fs_out)
    cutoff = 0.99 * 0.5 * min(fs_in, fs_out)
    window_width = num_zeros / (2.0 * cutoff)
    n_out = int(np.ceil(n_in * fs_out / fs_in))
    # phase structure: output sample k lands at t = k/fs_out; there are
    # (fs_out/g) distinct phases relative to the input grid.
    num_phases = fs_out // g
    step_in = fs_in // g  # input samples advanced per full phase cycle
    half_span = int(np.ceil(window_width * fs_in)) + 1
    taps = np.arange(-half_span, half_span + 1)
    # filters per phase
    filters = np.zeros((num_phases, taps.size))
    anchors = np.zeros(num_phases, dtype=np.int64)
    for p in range(num_phases):
        t_out = p / fs_out
        center = int(np.floor(t_out * fs_in))
        anchors[p] = center
        t_taps = (center + taps) / fs_in - t_out
        filters[p] = _hann_sinc_filter(t_taps, cutoff, window_width) / fs_in
    xp = np.pad(x, (half_span, half_span + step_in + 1))
    out = np.empty(n_out)
    ks = np.arange(n_out)
    cycle = ks // num_phases
    phase = ks % num_phases
    base = cycle * step_in + anchors[phase] + half_span  # padded index
    # gather windows: [n_out, taps]
    idx = base[:, None] + taps[None, :]
    out = np.einsum("nt,nt->n", xp[idx], filters[phase])
    return out.astype(np.float32)


def parse_kaldi_cmvn(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an am.mvn kaldi-nnet text file -> (means, vars) float32 arrays.

    Format consumed exactly as the reference does (paraformer.cpp:325-360):
    the line after <AddShift> starting with <LearnRateCoef> carries means,
    the line after <Rescale> carries vars; tokens [3:-1] are the values.
    """
    means, vars_ = [], []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        head = lines[i].split()
        if head and head[0] == "<AddShift>" and i + 1 < len(lines):
            item = lines[i + 1].split()
            if item and item[0] == "<LearnRateCoef>":
                means = [float(v) for v in item[3:-1]]
                i += 2
                continue
        elif head and head[0] == "<Rescale>" and i + 1 < len(lines):
            item = lines[i + 1].split()
            if item and item[0] == "<LearnRateCoef>":
                vars_ = [float(v) for v in item[3:-1]]
                i += 2
                continue
        i += 1
    return (np.asarray(means, dtype=np.float32),
            np.asarray(vars_, dtype=np.float32))


def write_kaldi_cmvn(path: str, means: np.ndarray, vars_: np.ndarray):
    """Write an am.mvn file in the format parse_kaldi_cmvn reads."""
    d = len(means)
    with open(path, "w") as f:
        f.write(f"<Nnet>\n<Splice> {d} {d}\n[ 0 ]\n")
        f.write(f"<AddShift> {d} {d}\n")
        f.write("<LearnRateCoef> 0 [ " +
                " ".join(f"{v:g}" for v in means) + " ]\n")
        f.write(f"<Rescale> {d} {d}\n")
        f.write("<LearnRateCoef> 0 [ " +
                " ".join(f"{v:g}" for v in vars_) + " ]\n")
        f.write("</Nnet>\n")
