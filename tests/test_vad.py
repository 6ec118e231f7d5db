"""VAD tests: streaming front-end parity, FSMN cache continuity, and the
decision state machine on synthetic posteriors."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asr2pass_tpu.config import FrontendConfig, VadConfig
from asr2pass_tpu.models import fsmn_vad
from asr2pass_tpu.runtime.streaming_frontend import (
    StreamingFrontend,
    offline_frontend,
)
from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions


@pytest.mark.parametrize("chunks", [
    [16000],
    [800] * 20,
    [123, 4567, 890, 10420],
])
def test_streaming_frontend_matches_offline_vadcfg(chunks):
    cfg = FrontendConfig(lfr_m=5, lfr_n=1)
    rng = np.random.default_rng(0)
    total = sum(chunks)
    wave = (rng.standard_normal(total) * 0.1).astype(np.float32)
    offline = offline_frontend(wave, cfg)
    sf = StreamingFrontend(cfg)
    got = []
    off = 0
    for i, c in enumerate(chunks):
        out = sf.accept(wave[off: off + c], is_final=(i == len(chunks) - 1))
        if out.shape[0]:
            got.append(out)
        off += c
    got = np.concatenate(got) if got else np.zeros((0, cfg.lfr_dim))
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def test_streaming_frontend_matches_offline_asrcfg():
    cfg = FrontendConfig(lfr_m=7, lfr_n=6)
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    offline = offline_frontend(wave, cfg)
    sf = StreamingFrontend(cfg)
    got = []
    for off in range(0, 32000, 9600):
        out = sf.accept(wave[off: off + 9600],
                        is_final=(off + 9600 >= 32000))
        if out.shape[0]:
            got.append(out)
    got = np.concatenate(got)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def test_fsmn_vad_streaming_matches_offline():
    cfg = VadConfig()
    params = fsmn_vad.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    t = 60
    feats = rng.standard_normal((1, t, cfg.input_dim)).astype(np.float32)
    full, _ = fsmn_vad.apply(params, jnp.asarray(feats),
                             fsmn_vad.init_caches(cfg, 1))
    caches = fsmn_vad.init_caches(cfg, 1)
    outs = []
    for s in range(0, t, 20):
        p, caches = fsmn_vad.apply(params, jnp.asarray(feats[:, s:s + 20]),
                                   caches)
        outs.append(np.asarray(p))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=1e-5)


def test_fsmn_vad_padded_valid_len():
    cfg = VadConfig()
    params = fsmn_vad.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    t = 30
    feats = rng.standard_normal((1, t, cfg.input_dim)).astype(np.float32)
    full, _ = fsmn_vad.apply(params, jnp.asarray(feats),
                             fsmn_vad.init_caches(cfg, 1))
    caches = fsmn_vad.init_caches(cfg, 1)
    got = []
    for s, n in [(0, 12), (12, 7), (19, 11)]:
        chunk = np.zeros((1, 15, cfg.input_dim), np.float32)
        chunk[0, :n] = feats[0, s:s + n]
        p, caches = fsmn_vad.apply(params, jnp.asarray(chunk), caches,
                                   jnp.asarray([n]))
        got.append(np.asarray(p[:, :n]))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=1e-5)


def _synthetic_scores(pattern, sil=0.99, speech=0.01):
    """pattern: list of (state, n_frames); returns [T, 2] posteriors with
    pdf0 = sil probability."""
    rows = []
    for state, n in pattern:
        p = sil if state == "sil" else speech
        rows.extend([[p, 1.0 - p]] * n)
    return np.asarray(rows, dtype=np.float32)


def _loud_wave(n_frames):
    rng = np.random.default_rng(0)
    return (rng.standard_normal(n_frames * 160 + 240) * 0.1).astype(np.float32)


def test_state_machine_offline_single_segment():
    sm = E2EVadStateMachine(VadOptions())
    scores = _synthetic_scores([("sil", 50), ("speech", 200), ("sil", 150)])
    segs = sm(scores, _loud_wave(len(scores)), is_final=True, online=False)
    assert len(segs) == 1
    s, e = segs[0]
    # speech starts at frame 50 (500 ms); start-point lookback pulls earlier
    assert 0 <= s <= 500
    # end: speech ends at 2500 ms + end-silence threshold window
    assert 2400 <= e <= 3400


def test_state_machine_online_open_then_close():
    sm = E2EVadStateMachine(VadOptions())
    wave = _loud_wave(100)
    # chunk 1: enters speech, no end yet -> [s, -1]
    segs1 = sm(_synthetic_scores([("sil", 30), ("speech", 70)]), wave,
               is_final=False, online=True)
    assert len(segs1) == 1
    assert segs1[0][1] == -1
    assert segs1[0][0] >= 0
    # chunk 2: long silence closes the segment -> [-1, e]
    segs2 = sm(_synthetic_scores([("speech", 20), ("sil", 120)]),
               _loud_wave(140), is_final=False, online=True)
    assert len(segs2) == 1
    assert segs2[0][0] == -1
    assert segs2[0][1] > 0


def test_state_machine_max_single_segment_split():
    sm = E2EVadStateMachine(VadOptions())
    scores = _synthetic_scores([("speech", 900)])
    segs = sm(scores, _loud_wave(len(scores)), is_final=True, online=False,
              max_single_segment_time=3000)
    # 9 s of speech with 3 s cap -> at least 3 segments
    assert len(segs) >= 3
    for s, e in segs:
        assert e - s <= 3300


def test_state_machine_all_silence_final():
    sm = E2EVadStateMachine(VadOptions())
    scores = _synthetic_scores([("sil", 300)])
    wave = np.zeros(300 * 160 + 240, dtype=np.float32)
    segs = sm(scores, wave, is_final=True, online=False)
    # fake start/end at 0 — reference emits a [0, x] stub or nothing
    for s, e in segs:
        assert s == 0
