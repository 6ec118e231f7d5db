"""Real-audio fixture tests: the reference's bundled sample wavs
(/root/reference/clients/audio/{SteveJobs_10s,number,xmov}.wav — the de
facto smoke-test inputs, SURVEY.md §4) run through every pipeline stage:
WAV parse, resampler (python vs native C++ cross-check), fbank/LFR/CMVN
front-end (streaming == offline invariant on real speech), VAD machinery,
and the full websocket server in offline and 2pass modes with the actual
file bytes.

Model weights in this environment are random, so text content is not
asserted — these tests pin down the audio/protocol/front-end plumbing on
real speech, where synthetic tones hide edge effects (DC offset, dynamic
range, 44-byte RIFF headers, long silence runs).
"""
import asyncio
import json
import os

import numpy as np
import pytest

AUDIO_DIR = "/root/reference/clients/audio"
WAVS = ["SteveJobs_10s.wav", "number.wav", "xmov.wav"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AUDIO_DIR), reason="reference audio fixtures absent")


def _load(name):
    from asr2pass_tpu.frontend.audio import load_wav_bytes

    with open(os.path.join(AUDIO_DIR, name), "rb") as f:
        data = f.read()
    samples, fs = load_wav_bytes(data)
    return samples, fs, data


# expected properties from the files themselves (16 kHz mono s16)
_EXPECT = {"SteveJobs_10s.wav": 175203, "number.wav": 208896,
           "xmov.wav": 83968}


@pytest.mark.parametrize("name", WAVS)
def test_wav_parse(name):
    """RIFF parse (audio.cpp:38-116 contract): fs, length, f32 range."""
    samples, fs, _ = _load(name)
    assert fs == 16000
    assert samples.shape[0] == _EXPECT[name]
    assert samples.dtype == np.float32
    assert np.abs(samples).max() <= 1.0
    assert np.abs(samples).max() > 0.01, "silent fixture?"


def test_resampler_python_vs_native_real_speech():
    """Kaldi-style linear resampler: python and C++ implementations agree
    on real speech (resample.cpp role)."""
    from asr2pass_tpu.frontend.audio import linear_resample
    from asr2pass_tpu.native import bindings

    if not bindings.available():
        pytest.skip("native lib not built")
    samples, _, _ = _load("xmov.wav")
    for fs_out in (8000, 44100):
        py = linear_resample(samples, 16000, fs_out)
        na = bindings.resample(samples, 16000, fs_out)
        assert abs(len(py) - len(na)) <= 1
        n = min(len(py), len(na))
        np.testing.assert_allclose(py[:n], na[:n], rtol=1e-4, atol=1e-5)


def test_frontend_offline_shapes_and_stats():
    """fbank+LFR+CMVN on real speech: frame math (25ms/10ms, LFR 7/6,
    paraformer.cpp:309-323,421-461) and sane statistics."""
    from asr2pass_tpu.config import FrontendConfig
    from asr2pass_tpu.runtime.streaming_frontend import offline_frontend

    cfg = FrontendConfig()
    samples, _, _ = _load("SteveJobs_10s.wav")
    feats = offline_frontend(samples, cfg)
    n_frames = 1 + (len(samples) - cfg.frame_length) // cfg.frame_shift
    n_lfr = (n_frames + cfg.lfr_n - 1) // cfg.lfr_n
    assert feats.shape == (n_lfr, cfg.lfr_dim)
    assert np.isfinite(feats).all()
    # real speech has meaningful dynamic range after log-mel
    assert feats.std() > 1.0


def test_frontend_streaming_equals_offline_on_real_speech():
    """StreamingFrontend fed 50 ms packets reproduces the offline
    front-end on real audio (the streaming fbank/LFR cache scheme,
    fsmn-vad-online.cpp:40-88 / paraformer-online.cpp:119-238)."""
    from asr2pass_tpu.config import FrontendConfig
    from asr2pass_tpu.runtime.streaming_frontend import (
        StreamingFrontend,
        offline_frontend,
    )

    cfg = FrontendConfig(lfr_m=5, lfr_n=1)   # VAD-style LFR
    samples, _, _ = _load("xmov.wav")
    ref = offline_frontend(samples, cfg)
    sf = StreamingFrontend(cfg)
    chunks = []
    step = 800
    for off in range(0, len(samples), step):
        out = sf.accept(samples[off: off + step],
                        is_final=off + step >= len(samples))
        if out is not None and len(out):
            chunks.append(out)
    got = np.concatenate(chunks, axis=0)
    n = min(len(ref), len(got))
    assert n >= len(ref) - 1
    # near-silent real-speech frames amplify fp-summation differences
    # through the log; demand exactness almost everywhere and sanity on the
    # handful of silence-floor bins
    diff = np.abs(got[:n] - ref[:n])
    assert np.mean(diff > 1e-3) < 1e-4
    assert diff.max() < 0.3


def test_vad_machinery_real_audio():
    """VAD NN + E2E state machine run end-to-end on real speech: segments
    (random weights => arbitrary decisions) must be well-formed and within
    the audio bounds (e2e-vad.h segment contract [start_ms, end_ms])."""
    import jax

    from asr2pass_tpu.config import VadConfig
    from asr2pass_tpu.models import fsmn_vad
    from asr2pass_tpu.runtime.vad_stream import vad_segments_offline

    cfg = VadConfig()
    params = fsmn_vad.init(jax.random.PRNGKey(0), cfg)
    samples, _, _ = _load("xmov.wav")
    dur_ms = len(samples) * 1000 // 16000
    segs = vad_segments_offline(params, cfg, samples)
    for s, e in segs:
        assert 0 <= s < e <= dur_ms + 200
    for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
        assert e1 <= s2, "segments must be ordered and disjoint"


@pytest.fixture(scope="module")
def models():
    import jax

    from asr2pass_tpu.config import VadConfig, paraformer_tiny, punc_tiny
    from asr2pass_tpu.models import ct_transformer, fsmn_vad, paraformer
    from asr2pass_tpu.server.engine import ServerModels
    from asr2pass_tpu.text.punc_tokenizer import PuncTokenizer
    from asr2pass_tpu.text.vocab import make_test_vocab

    acfg = paraformer_tiny()
    vcfg = VadConfig()
    pcfg = punc_tiny(vocab_size=300)
    return ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg), asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), vcfg), vad_cfg=vcfg,
        punc_params=ct_transformer.init(jax.random.PRNGKey(2), pcfg),
        punc_cfg=pcfg,
        punc_tokenizer=PuncTokenizer(
            ["<blank>", "<unk>"] + [chr(0x4E00 + i) for i in range(200)]),
    )


async def _serve(models, coro_fn):
    from asr2pass_tpu.server.ws_server import AsrWsServer

    server = AsrWsServer(models, host="127.0.0.1", port=0)
    srv = await server.serve()
    port = srv.sockets[0].getsockname()[1]
    try:
        return await coro_fn(port)
    finally:
        srv.close()
        await srv.wait_closed()
        server.executor.shutdown(wait=False)


def test_offline_server_accepts_real_wav_bytes(models):
    """Whole-file offline upload of the actual .wav bytes (RIFF header and
    all) — the reference's offline client path (websocket-server.cpp:60-151
    with wav_format='wav')."""
    import websockets

    _, _, wav_bytes = _load("SteveJobs_10s.wav")

    async def client(port):
        uri = f"ws://127.0.0.1:{port}"
        async with websockets.connect(uri, max_size=1 << 30) as ws:
            await ws.send(json.dumps({
                "mode": "offline", "wav_name": "jobs", "wav_format": "wav",
                "audio_fs": 16000, "is_speaking": True, "itn": False,
            }))
            await ws.send(wav_bytes)
            await ws.send(json.dumps({"is_speaking": False}))
            return json.loads(await asyncio.wait_for(ws.recv(), timeout=300))

    msg = asyncio.run(_serve(models, client))
    assert msg["is_final"] and msg["mode"] == "offline"
    assert msg["wav_name"] == "jobs"
    assert isinstance(msg["text"], str) and len(msg["text"]) > 0
    stamps = msg.get("timestamp")
    if stamps:
        ts = json.loads(stamps) if isinstance(stamps, str) else stamps
        dur_ms = 175203 * 1000 // 16000
        for b, e in ts:
            assert 0 <= b <= e <= dur_ms + 1000


def test_2pass_streaming_real_audio(models):
    """Real speech streamed in 600 ms strides through the 2pass protocol:
    partials + a final arrive, protocol fields well-formed."""
    import websockets

    samples, _, _ = _load("number.wav")
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()

    async def client(port):
        uri = f"ws://127.0.0.1:{port}"
        msgs = []
        async with websockets.connect(uri, max_size=1 << 30) as ws:
            await ws.send(json.dumps({
                "mode": "2pass", "chunk_size": [5, 10, 5],
                "chunk_interval": 10, "audio_fs": 16000,
                "wav_name": "number", "wav_format": "pcm",
                "is_speaking": True, "itn": False,
            }))
            stride = int(0.6 * 16000 * 2)
            for i in range(0, len(pcm), stride):
                await ws.send(pcm[i: i + stride])
            await ws.send(json.dumps({"is_speaking": False}))
            while True:
                m = json.loads(await asyncio.wait_for(ws.recv(), timeout=300))
                msgs.append(m)
                if m.get("is_final"):
                    break
        return msgs

    msgs = asyncio.run(_serve(models, client))
    assert msgs[-1]["is_final"]
    modes = {m.get("mode") for m in msgs}
    assert "2pass-online" in modes and "2pass-offline" in modes
    assert all(m["wav_name"] == "number" for m in msgs)
