"""Golden tests for the fbank/LFR/CMVN front-end.

The reference computes fbank through kaldi-native-fbank (paraformer.cpp:
309-323) and LFR/CMVN in LfrCmvn (paraformer.cpp:421-461). These tests pin
our TPU matmul-DFT formulation against an independent straight-line numpy
implementation of the same published formulas, and the LFR gather against a
direct loop port.
"""
import numpy as np
import pytest

from asr2pass_tpu.config import FrontendConfig
from asr2pass_tpu.frontend import (
    FbankExtractor,
    apply_cmvn,
    apply_lfr,
    linear_resample,
    load_pcm_bytes,
    load_wav_bytes,
    num_frames,
)
from asr2pass_tpu.frontend.audio import parse_kaldi_cmvn, write_kaldi_cmvn
from asr2pass_tpu.frontend.fbank import _feature_window, mel_filterbank


def ref_fbank_numpy(wave, cfg: FrontendConfig):
    """Straight-line numpy fbank implementing the kaldi formulas."""
    x = wave.astype(np.float64) * cfg.scale_input
    n = num_frames(len(x), cfg)
    win = _feature_window(cfg)
    mel = mel_filterbank(cfg)
    out = np.zeros((n, cfg.n_mels))
    for i in range(n):
        frame = x[i * cfg.frame_shift: i * cfg.frame_shift + cfg.frame_length].copy()
        frame -= frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - cfg.preemphasis * frame[0]
        pre[1:] = frame[1:] - cfg.preemphasis * frame[:-1]
        frame = pre * win
        spec = np.fft.rfft(frame, cfg.n_fft)
        power = np.abs(spec[: cfg.n_fft // 2]) ** 2
        out[i] = np.log(np.maximum(power @ mel, np.finfo(np.float32).eps))
    return out


@pytest.fixture(scope="module")
def cfg():
    return FrontendConfig()


def test_fbank_matches_reference_formula(cfg):
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ours = np.asarray(FbankExtractor(cfg)(wave))
    ref = ref_fbank_numpy(wave, cfg)
    assert ours.shape == ref.shape == (98, 80)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_fbank_short_input_returns_empty(cfg):
    wave = np.zeros(200, dtype=np.float32)
    assert FbankExtractor(cfg)(wave).shape == (0, 80)


def test_fbank_povey_window():
    cfg = FrontendConfig(window="povey")
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(4000) * 0.05).astype(np.float32)
    ours = np.asarray(FbankExtractor(cfg)(wave))
    ref = ref_fbank_numpy(wave, cfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_fbank_batched_matches_single(cfg):
    rng = np.random.default_rng(2)
    waves = (rng.standard_normal((3, 8000)) * 0.1).astype(np.float32)
    ex = FbankExtractor(cfg)
    n = num_frames(8000, cfg)
    batched = np.asarray(ex.batched(waves, n))
    for b in range(3):
        np.testing.assert_allclose(
            batched[b], np.asarray(ex(waves[b])), rtol=1e-5, atol=1e-5
        )


def ref_lfr_loop(feats, lfr_m, lfr_n):
    """Direct port of the reference LFR loop (paraformer.cpp:421-453)."""
    feats = [row for row in feats]
    T = len(feats)
    T_lfr = int(np.ceil(T / lfr_n))
    left = (lfr_m - 1) // 2
    padded = [feats[0]] * left + feats
    T = T + left
    out = []
    for i in range(T_lfr):
        if lfr_m <= T - i * lfr_n:
            out.append(np.concatenate(padded[i * lfr_n: i * lfr_n + lfr_m]))
        else:
            num_padding = lfr_m - (T - i * lfr_n)
            frame = list(padded[i * lfr_n:])
            frame += [padded[-1]] * num_padding
            out.append(np.concatenate(frame))
    return np.stack(out)


@pytest.mark.parametrize("lfr_m,lfr_n,t", [(7, 6, 100), (5, 1, 37), (7, 6, 7), (1, 1, 5)])
def test_lfr_matches_reference_loop(lfr_m, lfr_n, t):
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((t, 8)).astype(np.float32)
    ours = np.asarray(apply_lfr(feats, lfr_m, lfr_n))
    ref = ref_lfr_loop(feats, lfr_m, lfr_n)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cmvn_affine():
    feats = np.ones((2, 4), dtype=np.float32)
    means = np.array([1, 2, 3, 4], dtype=np.float32)
    vars_ = np.array([2, 2, 2, 2], dtype=np.float32)
    out = np.asarray(apply_cmvn(feats, means, vars_))
    np.testing.assert_allclose(out, (feats + means) * vars_)


def test_cmvn_roundtrip(tmp_path):
    means = np.arange(560, dtype=np.float32) * 0.01 - 3
    vars_ = np.ones(560, dtype=np.float32) * 0.5
    p = str(tmp_path / "am.mvn")
    write_kaldi_cmvn(p, means, vars_)
    m2, v2 = parse_kaldi_cmvn(p)
    np.testing.assert_allclose(m2, means, rtol=1e-5)
    np.testing.assert_allclose(v2, vars_, rtol=1e-5)


def test_resample_preserves_sine():
    fs_in, fs_out = 8000, 16000
    t = np.arange(fs_in) / fs_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = linear_resample(x, fs_in, fs_out)
    assert abs(len(y) - 2 * len(x)) <= 1
    t2 = np.arange(len(y)) / fs_out
    expect = np.sin(2 * np.pi * 440 * t2)
    # ignore filter edges
    sl = slice(200, -200)
    err = np.max(np.abs(y[sl] - expect[sl]))
    assert err < 5e-3


def test_resample_downsample_441k():
    fs_in, fs_out = 44100, 16000
    t = np.arange(fs_in // 2) / fs_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = linear_resample(x, fs_in, fs_out)
    t2 = np.arange(len(y)) / fs_out
    expect = np.sin(2 * np.pi * 1000 * t2)
    sl = slice(200, len(y) - 200)
    assert np.max(np.abs(y[sl] - expect[sl])) < 1e-2


def test_wav_pcm_roundtrip(tmp_path):
    import wave as wavmod

    rng = np.random.default_rng(4)
    pcm = (rng.integers(-2000, 2000, 1600)).astype("<i2")
    p = tmp_path / "a.wav"
    with wavmod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    x, fs = load_wav_bytes(p.read_bytes())
    assert fs == 16000
    np.testing.assert_allclose(x, pcm.astype(np.float32) / 32768.0)
    y = load_pcm_bytes(pcm.tobytes())
    np.testing.assert_allclose(x, y)


def test_offline_frontend_device_matches_host():
    """The device-fused offline front-end (int16 upload -> fbank -> LFR
    gather -> CMVN, offline_frontend_device) equals the host
    offline_frontend on PCM-grid input, row for row across a padded
    batch of different lengths."""
    from asr2pass_tpu.config import FrontendConfig
    from asr2pass_tpu.frontend.audio import quantize_pcm
    from asr2pass_tpu.frontend.fbank import num_frames
    from asr2pass_tpu.frontend.lfr import lfr_len
    from asr2pass_tpu.runtime.streaming_frontend import (
        offline_frontend,
        offline_frontend_device,
    )

    cfg = FrontendConfig()
    rng = np.random.default_rng(3)
    means = rng.standard_normal(cfg.lfr_dim).astype(np.float32)
    vars_ = (rng.random(cfg.lfr_dim).astype(np.float32) + 0.5)
    bufs = [quantize_pcm(rng.standard_normal(n).astype(np.float32) * 0.1)
            for n in (16000, 9000, 4000)]
    ns = [num_frames(len(b), cfg) for b in bufs]
    t_lfrs = [lfr_len(n, cfg.lfr_m, cfg.lfr_n) for n in ns]
    bucket = 64
    dev = np.asarray(offline_frontend_device(bufs, ns, bucket, cfg,
                                             means, vars_, batch_b=4))
    assert dev.shape == (4, bucket, cfg.lfr_dim)
    for i, b in enumerate(bufs):
        host = offline_frontend(b, cfg, means, vars_)
        assert host.shape[0] == t_lfrs[i]
        np.testing.assert_allclose(dev[i, : t_lfrs[i]], host, atol=2e-4)
