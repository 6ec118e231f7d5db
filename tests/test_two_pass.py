"""2pass orchestration tests: splitter event mapping and the full session
with a scripted VAD (model weights random; mechanics under test)."""
import jax
import numpy as np

from asr2pass_tpu.config import paraformer_tiny
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.runtime.asr_stream import ParaformerOnlineStream
from asr2pass_tpu.runtime.audio_splitter import TwoPassSplitter
from asr2pass_tpu.runtime.offline_asr import ParaformerOffline
from asr2pass_tpu.runtime.two_pass import TwoPassSession
from asr2pass_tpu.text.vocab import make_test_vocab


def test_splitter_closed_segment():
    sp = TwoPassSplitter(16000)
    wave = np.arange(32000, dtype=np.float32) / 32000
    online, offline = sp.feed(wave, [[100, 900]], chunk_len=9600)
    assert len(offline) == 1
    f = offline[0]
    assert f.global_start == 100 and f.global_end == 900
    assert len(f.data) == 800 * 16
    np.testing.assert_allclose(f.data[0], wave[1600])
    # closed segment also lands once in the online queue, final-flagged
    assert len(online) == 1 and online[0].is_final


def test_splitter_open_then_close():
    sp = TwoPassSplitter(16000)
    sr_ms = 16
    # step 1: 1 s arrives, segment opens at 200 ms
    w1 = np.ones(16000, np.float32)
    online1, offline1 = sp.feed(w1, [[200, -1]], chunk_len=9600)
    # open region [200,1000) = 800 ms -> one 600 ms chunk
    assert len(offline1) == 0
    assert len(online1) == 1
    assert online1[0].global_start == 200
    assert online1[0].global_end == 800
    assert not online1[0].is_final
    # step 2: another second, no events: drains [800, 2000)
    online2, _ = sp.feed(np.ones(16000, np.float32), [], chunk_len=9600)
    assert len(online2) == 2
    # step 3: close at 2100 ms
    w3 = np.ones(4800, np.float32)
    online3, offline3 = sp.feed(w3, [[-1, 2100]], chunk_len=9600)
    assert len(offline3) == 1
    assert offline3[0].global_start == 200
    assert offline3[0].global_end == 2100
    assert len(offline3[0].data) == 1900 * sr_ms
    assert online3 and online3[-1].is_final


def test_splitter_ring_trim_keeps_open_segment():
    sp = TwoPassSplitter(16000)
    sp.feed(np.ones(16000, np.float32), [[100, -1]], chunk_len=9600)
    for _ in range(5):
        sp.feed(np.ones(16000, np.float32), [], chunk_len=9600)
    _, offline = sp.feed(np.ones(16000, np.float32), [[-1, 6900]],
                         chunk_len=9600)
    assert len(offline) == 1
    # open offline segment must survive the ring trim in full
    assert len(offline[0].data) == (6900 - 100) * 16


class FakeVad:
    """Scripted VAD: returns pre-planned events keyed by call index."""

    class _Cfg:
        sample_rate = 16000

    cfg = _Cfg()

    def __init__(self, script):
        self.script = script
        self.calls = 0

    def accept(self, samples, is_final=False):
        ev = self.script.get(self.calls, [])
        self.calls += 1
        return ev

    def reset(self):
        self.calls = 0


def _build_session(mode="2pass"):
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    online = ParaformerOnlineStream(params, cfg, make_test_vocab(cfg.vocab_size))
    offline = ParaformerOffline(params, cfg, make_test_vocab(cfg.vocab_size))
    # speech 200..2000 ms
    vad = FakeVad({0: [[200, -1]], 3: [[-1, 2000]]})
    return TwoPassSession(vad, online, offline, mode=mode)


def test_two_pass_session_partials_then_final():
    sess = _build_session()
    partials = ""
    finals = ""
    stamps = []
    for i in range(4):
        res = sess.feed(np.random.default_rng(i).standard_normal(16000)
                        .astype(np.float32) * 0.1, is_final=(i == 3))
        partials += res.partial
        finals += res.final_text
        stamps.extend(res.timestamps)
    assert len(partials) > 0     # pass-1 produced partial text
    assert len(finals) > 0       # pass-2 produced a corrected final
    assert stamps == []          # non-timestamp model


def test_offline_recognizer_batches_by_bucket():
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(1), cfg)
    off = ParaformerOffline(params, cfg, make_test_vocab(cfg.vocab_size))
    rng = np.random.default_rng(2)
    segs = [rng.standard_normal(16000).astype(np.float32) * 0.1,
            rng.standard_normal(48000).astype(np.float32) * 0.1,
            rng.standard_normal(16000).astype(np.float32) * 0.1]
    outs = off.recognize_batch(segs)
    assert len(outs) == 3
    # identical segments at different batch positions agree
    single = off.recognize(segs[0])
    assert outs[0][0] == single[0]
    assert all(isinstance(t, str) for t, _ in outs)


def test_offline_recognizer_empty_segment():
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(1), cfg)
    off = ParaformerOffline(params, cfg, make_test_vocab(cfg.vocab_size))
    text, ts = off.recognize(np.zeros(100, np.float32))
    assert text == "" and ts == []
