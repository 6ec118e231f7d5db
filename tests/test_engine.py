"""StreamEngine tests: batched multi-stream serving equals per-stream
results, slot lifecycle, pass-2 pooling."""
import jax
import numpy as np
import pytest

from asr2pass_tpu.config import VadConfig, paraformer_tiny
from asr2pass_tpu.models import fsmn_vad, paraformer
from asr2pass_tpu.runtime.engine import StreamEngine
from asr2pass_tpu.server.engine import ServerModels
from asr2pass_tpu.text.vocab import make_test_vocab


@pytest.fixture(scope="module")
def models():
    acfg = paraformer_tiny()
    return ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
    )


def _wave(seed, seconds=2.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def _drive(engine, sid, wave, step_ms=600):
    out = []
    step = int(16000 * step_ms / 1000)
    for off in range(0, len(wave), step):
        engine.feed(sid, wave[off: off + step],
                    is_final=off + step >= len(wave))
        engine.step()
        out.extend(engine.poll(sid))
    for _ in range(3):  # drain
        engine.step()
        out.extend(engine.poll(sid))
    return out


def test_engine_single_stream_produces_both_passes(models):
    eng = StreamEngine(models, capacity=4)
    sid = eng.open()
    res = _drive(eng, sid, _wave(0))
    modes = {r["mode"] for r in res}
    assert "2pass-online" in modes
    assert "2pass-offline" in modes
    eng.close(sid)


def test_engine_streams_are_isolated(models):
    """Two concurrent streams through the batched state must produce
    exactly what each produces alone."""
    w1, w2 = _wave(1), _wave(2, seconds=1.5)

    solo = StreamEngine(models, capacity=4)
    s1 = solo.open()
    r1_solo = _drive(solo, s1, w1)

    solo2 = StreamEngine(models, capacity=4)
    s2 = solo2.open()
    r2_solo = _drive(solo2, s2, w2)

    both = StreamEngine(models, capacity=4)
    a = both.open()
    b = both.open()
    ra, rb = [], []
    step = int(16000 * 0.6)
    n = max(len(w1), len(w2))
    for off in range(0, n, step):
        if off < len(w1):
            both.feed(a, w1[off: off + step],
                      is_final=off + step >= len(w1))
        if off < len(w2):
            both.feed(b, w2[off: off + step],
                      is_final=off + step >= len(w2))
        both.step()
        ra.extend(both.poll(a))
        rb.extend(both.poll(b))
    for _ in range(3):
        both.step()
        ra.extend(both.poll(a))
        rb.extend(both.poll(b))

    def text_of(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    assert text_of(ra, "2pass-online") == text_of(r1_solo, "2pass-online")
    assert text_of(rb, "2pass-online") == text_of(r2_solo, "2pass-online")
    assert text_of(ra, "2pass-offline") == text_of(r1_solo, "2pass-offline")
    assert text_of(rb, "2pass-offline") == text_of(r2_solo, "2pass-offline")


def test_engine_slot_reuse(models):
    eng = StreamEngine(models, capacity=2)
    a = eng.open()
    r1 = _drive(eng, a, _wave(3))
    eng.close(a)
    b = eng.open()
    assert b == a  # slot recycled
    r2 = _drive(eng, b, _wave(3))

    def text_of(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    # same audio on a recycled slot reproduces the same text
    assert text_of(r1, "2pass-online") == text_of(r2, "2pass-online")


def test_engine_capacity_guard(models):
    eng = StreamEngine(models, capacity=1)
    eng.open()
    with pytest.raises(RuntimeError):
        eng.open()


def test_engine_burst_feed_no_overflow(models):
    """A client that delivers the whole utterance before the first step
    (websocket burst) must lose nothing to the per-tick VAD bucket —
    leftovers re-queue and later steps drain them."""
    wave = _wave(5, seconds=3.0)

    ticked = StreamEngine(models, capacity=2)
    sid = ticked.open()
    ref = _drive(ticked, sid, wave)

    burst = StreamEngine(models, capacity=2)
    sid2 = burst.open()
    burst.feed(sid2, wave, is_final=True)
    out = []
    for _ in range(40):
        burst.step()
        out.extend(burst.poll(sid2))

    def final_text(res):
        return "".join(r["text"] for r in res if r["mode"] == "2pass-offline")

    assert final_text(out) == final_text(ref)
