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
    from asr2pass_tpu.runtime.engine import EngineAtCapacity

    eng = StreamEngine(models, capacity=1)
    eng.open()
    with pytest.raises(EngineAtCapacity):
        eng.open()


def test_engine_no_cross_delivery_on_slot_reclaim(models):
    """VERDICT r3 weak #2: client A disconnects with a segment in the
    async pass-2 lane; client B reclaims the slot. A's transcript must
    NOT reach B, reclaim must be deferred while the segment is in
    flight, and no counter may go negative."""
    import threading
    import time

    from asr2pass_tpu.runtime.engine import EngineAtCapacity

    eng = StreamEngine(models, capacity=1, pass2_async=True)
    gate = threading.Event()
    orig = eng._process_segments

    def gated(pairs, settled=None):
        gate.wait(timeout=60)
        orig(pairs, settled)

    eng._process_segments = gated
    try:
        a = eng.open()
        eng.feed(a, _wave(21, seconds=2.0), is_final=True)
        old_slot = eng.slots[a]
        deadline = time.time() + 60
        while old_slot.p2_inflight == 0 and time.time() < deadline:
            eng.step()
            time.sleep(0.01)
        assert old_slot.p2_inflight > 0      # segment is in the lane
        eng.close(a)
        # the old connection's decode is still in flight: the only slot
        # must not be reclaimable yet
        with pytest.raises(EngineAtCapacity):
            eng.open()
        gate.set()
        deadline = time.time() + 60
        while old_slot.p2_inflight > 0 and time.time() < deadline:
            time.sleep(0.01)
        assert old_slot.p2_inflight == 0     # exactly drained, not -1
        b = eng.open()
        assert b == a                        # slot recycled after drain
        assert eng.slots[b].gen == old_slot.gen + 1
        assert eng.poll(b) == []             # nothing cross-delivered
        assert eng.slots[b].p2_inflight == 0
        assert eng.drained(b)
    finally:
        gate.set()
        eng.shutdown()


def test_engine_pass2_error_path_decrements_captured_slot(models):
    """A poisoned pass-2 batch must decrement the inflight counter of the
    slot objects captured at handoff (not whatever connection currently
    owns the index), so drained() converges and reuse is clean."""
    import time

    eng = StreamEngine(models, capacity=1, pass2_async=True)
    calls = {"n": 0}

    def boom(pairs, settled=None):
        calls["n"] += 1
        raise RuntimeError("poisoned segment")

    eng._process_segments = boom
    try:
        a = eng.open()
        eng.feed(a, _wave(22, seconds=2.0), is_final=True)
        deadline = time.time() + 60
        while ((not calls["n"] or not eng.drained(a))
               and time.time() < deadline):
            eng.step()
            time.sleep(0.01)
        assert calls["n"] >= 1
        assert eng.drained(a)
        assert eng.slots[a].p2_inflight == 0
        eng.close(a)
        b = eng.open()
        assert eng.slots[b].p2_inflight == 0
        assert eng.drained(b)
    finally:
        eng.shutdown()


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


@pytest.mark.parametrize("lfr_m,lfr_n", [(5, 1), (5, 2), (7, 3)])
def test_fused_vad_step_matches_reference_frontend(models, lfr_m, lfr_n):
    """The engine's fused fbank+LFR+CMVN+NN device step must emit exactly
    the posteriors of the reference path (StreamingFrontend.accept ->
    fsmn_vad.apply), across chunk boundaries, history-ring carries and the
    final-tail clamp — including LFR(m,n) configs with n>1 (the bucket is
    sized 64*lfr_n+8 so staging can never overflow it)."""
    import jax.numpy as jnp

    from asr2pass_tpu.config import FrontendConfig
    from asr2pass_tpu.models import fsmn_vad
    from asr2pass_tpu.runtime.engine import _fused_vad_step
    from asr2pass_tpu.runtime.streaming_frontend import StreamingFrontend

    if (lfr_m, lfr_n) == (5, 1):
        cfg = models.vad_cfg
        params = models.vad_params
    else:
        cfg = VadConfig(
            frontend=FrontendConfig(lfr_m=lfr_m, lfr_n=lfr_n),
            input_dim=80 * lfr_m, proj_dim=32, fsmn_layers=2,
            hidden_dim=48, output_dim=16)
        params = fsmn_vad.init(jax.random.PRNGKey(3), cfg)
    fcfg = cfg.frontend
    capacity = 2
    step, need, max_new = _fused_vad_step(fcfg, capacity)
    means = jnp.zeros(fcfg.lfr_dim, jnp.float32)
    vars_ = jnp.ones(fcfg.lfr_dim, jnp.float32)

    rng = np.random.default_rng(7)
    from asr2pass_tpu.frontend.audio import quantize_pcm

    # PCM-grid wave: the fused step stages int16 (bit-exact on this grid)
    wave = quantize_pcm(rng.standard_normal(16000 * 2) * 0.1)

    # reference path (one stream)
    ref_fe = StreamingFrontend(fcfg)
    ref_caches = fsmn_vad.init_caches(cfg, 1)
    ref_probs = []
    # fused path state (slot 0 active, slot 1 idle)
    from asr2pass_tpu.runtime.engine import _RING_SAMPLES as RING

    fe = StreamingFrontend(fcfg)  # stage() only
    hist = jnp.zeros((capacity, fcfg.lfr_m - 1, fcfg.n_mels), jnp.float32)
    caches = fsmn_vad.init_caches(cfg, capacity)
    audio_ring = jnp.zeros((capacity, RING), jnp.int16)
    abs_fed = 0
    total = nxt = 0
    fused_probs = []

    left = (fcfg.lfr_m - 1) // 2
    chunks = [3200, 5000, 160, 7040, 9000, len(wave) - 24400]
    off = 0
    for i, n in enumerate(chunks):
        piece, off = wave[off: off + n], off + n
        is_final = i == len(chunks) - 1
        feats = ref_fe.accept(piece, is_final)
        if feats.shape[0]:
            t = feats.shape[0]
            pad = np.zeros((1, 72, feats.shape[1]), np.float32)
            pad[0, :t] = feats
            p, ref_caches = fsmn_vad.apply(
                params, jnp.asarray(pad), ref_caches, jnp.asarray([t]))
            ref_probs.append(np.asarray(p[0, :t]))

        buf, nf = fe.stage(piece)
        # NEW-samples-only upload; the step re-reads the fbank window
        # (residual + new) from the device audio ring
        waves = np.zeros((capacity, max_new), np.int16)
        waves[0, :len(piece)] = (piece * 32768.0).astype(np.int16)
        win_off = (abs_fed - (len(buf) - len(piece))) % RING
        tot = total + nf
        if is_final:
            upto = -(-tot // fcfg.lfr_n)
            fe.reset()
        else:
            upto = max((tot - 1 - (fcfg.lfr_m - 1) + left)
                       // fcfg.lfr_n + 1, 0)
        upto = max(upto, nxt)
        k = upto - nxt
        probs, hist, caches, audio_ring = step(
            params, means, vars_, jnp.asarray(waves),
            jnp.asarray([nf, 0], np.int32),
            jnp.asarray([nxt, 0], np.int32),
            jnp.asarray([tot, 0], np.int32),
            jnp.asarray([k, 0], np.int32),
            jnp.asarray([is_final, False]),
            hist, caches, audio_ring,
            jnp.asarray([abs_fed % RING, 0], np.int32),
            jnp.asarray([len(piece), 0], np.int32),
            jnp.asarray([win_off, 0], np.int32))
        abs_fed += len(piece)
        if k:
            fused_probs.append(np.asarray(probs[0, :k]))
        total, nxt = (0, 0) if is_final else (tot, upto)

    # the fused step returns the device-summed silence posterior per frame
    ref = np.concatenate(ref_probs)[:, 0]
    fused = np.concatenate(fused_probs)
    assert ref.shape == fused.shape
    np.testing.assert_allclose(fused, ref, atol=2e-5)


@pytest.fixture(scope="module")
def hw_models():
    """Models with a hotword-capable decoder + ITN, for feature-parity
    tests (the reference supports hotwords + per-request VAD config on
    every connection, websocket-server-2pass.cpp:424-523)."""
    from asr2pass_tpu.config import (DecoderConfig, EncoderConfig,
                                     ParaformerConfig, PredictorConfig)
    from asr2pass_tpu.text.itn import ChineseITN

    acfg = ParaformerConfig(
        encoder=EncoderConfig(input_size=560, output_size=64, num_blocks=2,
                              attention_heads=2, linear_units=128),
        decoder=DecoderConfig(num_blocks=2, attention_heads=2,
                              linear_units=128),
        predictor=PredictorConfig(idim=64),
        vocab_size=64, use_hotword=True,
    )
    return ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
        itn=ChineseITN(),
    )


def _drive_session(session, wave, step_ms=600):
    """TwoPassSession reference results in engine poll() shape."""
    out = []
    step = int(16000 * step_ms / 1000)
    for off in range(0, len(wave), step):
        res = session.feed(wave[off: off + step],
                           is_final=off + step >= len(wave))
        if res.partial:
            out.append({"mode": "2pass-online", "text": res.partial})
        if res.final_text:
            out.append({"mode": "2pass-offline", "text": res.final_text})
    return out


def _texts(results, mode):
    return "".join(r["text"] for r in results if r["mode"] == mode)


def test_engine_matches_session_with_hotwords_and_vad_overrides(hw_models):
    """A hotworded, vad-tuned, itn-enabled connection produces the same
    pass-1 and pass-2 text through the batched engine as through its own
    TwoPassSession — engine-mode feature parity."""
    rng = np.random.default_rng(7)
    hw_emb = rng.standard_normal((3, 64)).astype(np.float32)
    wave = _wave(9, seconds=2.5)
    opts = dict(vad_tail_sil=500, vad_max_len=4000)

    session = hw_models.create_session(mode="2pass", hw_emb=hw_emb,
                                       use_itn=True, **opts)
    ref = _drive_session(session, wave)

    eng = StreamEngine(hw_models, capacity=4)
    sid = eng.open(hw_emb=hw_emb, use_itn=True, **opts)
    got = _drive(eng, sid, wave)

    assert _texts(got, "2pass-online") == _texts(ref, "2pass-online")
    assert _texts(got, "2pass-offline") == _texts(ref, "2pass-offline")
    assert _texts(got, "2pass-offline")  # non-degenerate

    # hotwords actually flow into pass-2: different embeddings, different
    # result (the hotword cross-attention is live in the batched path)
    eng2 = StreamEngine(hw_models, capacity=4)
    sid2 = eng2.open(hw_emb=None, **opts)
    got_nohw = _drive(eng2, sid2, wave)
    assert (_texts(got_nohw, "2pass-offline")
            != _texts(got, "2pass-offline"))


def test_engine_per_slot_itn_flag(hw_models):
    """st.itn=False must bypass the global ITN for that slot only."""
    wave = _wave(11, seconds=1.5)
    session = hw_models.create_session(mode="2pass", use_itn=False)
    ref = _drive_session(session, wave)

    eng = StreamEngine(hw_models, capacity=4)
    a = eng.open(use_itn=False)
    got = _drive(eng, a, wave)
    assert _texts(got, "2pass-offline") == _texts(ref, "2pass-offline")


def test_engine_async_pass2_lane(hw_models):
    """pass2_async: segments decode on the background lane; results and
    drained() converge to the sync behavior."""
    import time

    wave = _wave(13, seconds=2.0)
    sync_eng = StreamEngine(hw_models, capacity=4)
    s = sync_eng.open()
    ref = _drive(sync_eng, s, wave)

    eng = StreamEngine(hw_models, capacity=4, pass2_async=True)
    sid = eng.open()
    out = []
    step = int(16000 * 0.6)
    for off in range(0, len(wave), step):
        eng.feed(sid, wave[off: off + step],
                 is_final=off + step >= len(wave))
        eng.step()
        out.extend(eng.poll(sid))
    deadline = time.time() + 30
    while not eng.drained(sid) and time.time() < deadline:
        eng.step()
        out.extend(eng.poll(sid))
        time.sleep(0.01)
    out.extend(eng.poll(sid))
    assert eng.drained(sid)
    assert _texts(out, "2pass-online") == _texts(ref, "2pass-online")
    assert _texts(out, "2pass-offline") == _texts(ref, "2pass-offline")


def test_engine_back_to_back_finals_one_tick(models):
    """Two utterances whose finals both land inside a single tick must
    produce the same per-utterance results as when fed tick-by-tick:
    the fused pass-1 lane pauses staging while a flush boundary
    (p1_flush_at) is draining, so finals never merge."""
    w1, w2 = _wave(11, seconds=1.2), _wave(12, seconds=1.2)

    ref = StreamEngine(models, capacity=2)
    sid = ref.open()
    r1 = _drive(ref, sid, w1)
    ref.close(sid)
    sid = ref.open()
    r2 = _drive(ref, sid, w2)

    eng = StreamEngine(models, capacity=2)
    sid = eng.open()
    # both utterances (each ending in an is_final) queued before ONE step
    eng.feed(sid, w1, is_final=True)
    eng.feed(sid, w2, is_final=True)
    got = []
    for _ in range(40):
        eng.step()
        got.extend(eng.poll(sid))
        if eng.drained(sid):
            break
    assert eng.drained(sid)

    def text(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    assert text(got, "2pass-online") == (text(r1, "2pass-online")
                                         + text(r2, "2pass-online"))


def test_engine_vad_async_lane_matches_sync(models):
    """vad_async: the posterior fetch + automaton + splitter run on the
    decide lane; results and drained() converge to the sync engine's
    output (the serving default — the tick never blocks on a device
    sync)."""
    import time

    wave = _wave(31, seconds=2.0)
    sync_eng = StreamEngine(models, capacity=2)
    s = sync_eng.open()
    ref = _drive(sync_eng, s, wave)

    eng = StreamEngine(models, capacity=2, pass2_async=True,
                       vad_async=True)
    try:
        sid = eng.open()
        out = []
        step = int(16000 * 0.6)
        for off in range(0, len(wave), step):
            eng.feed(sid, wave[off: off + step],
                     is_final=off + step >= len(wave))
            eng.step()
            out.extend(eng.poll(sid))
        deadline = time.time() + 60
        while not eng.drained(sid) and time.time() < deadline:
            eng.step()
            out.extend(eng.poll(sid))
            time.sleep(0.01)
        out.extend(eng.poll(sid))
        assert eng.drained(sid)
        assert eng.slots[sid].vd_inflight == 0
        assert _texts(out, "2pass-online") == _texts(ref, "2pass-online")
        assert _texts(out, "2pass-offline") == _texts(ref, "2pass-offline")
        assert _texts(out, "2pass-offline")
    finally:
        eng.shutdown()


def test_engine_fused_fetch_matches_sync(models):
    """fused_fetch (the serving default): one combined device fetch per
    tick, pass-1 staged one decision behind — results converge to the
    sync engine's output."""
    import time

    wave = _wave(33, seconds=2.0)
    sync_eng = StreamEngine(models, capacity=2)
    s = sync_eng.open()
    ref = _drive(sync_eng, s, wave)

    eng = StreamEngine(models, capacity=2, pass2_async=True,
                       fused_fetch=True)
    try:
        sid = eng.open()
        out = []
        step = int(16000 * 0.6)
        for off in range(0, len(wave), step):
            eng.feed(sid, wave[off: off + step],
                     is_final=off + step >= len(wave))
            eng.step()
            out.extend(eng.poll(sid))
        deadline = time.time() + 60
        while not eng.drained(sid) and time.time() < deadline:
            eng.step()
            out.extend(eng.poll(sid))
            time.sleep(0.01)
        out.extend(eng.poll(sid))
        assert eng.drained(sid)
        assert _texts(out, "2pass-online") == _texts(ref, "2pass-online")
        assert _texts(out, "2pass-offline") == _texts(ref, "2pass-offline")
        assert _texts(out, "2pass-offline")
    finally:
        eng.shutdown()


def test_engine_long_stream_ring_wrap(models):
    """A stream longer than the device audio ring exercises the
    ring-wrap write path (boundary-capped staging) and the wrap-reading
    pass-1 gather; results must equal the TwoPassSession reference on
    the same 12 s wave. Uses a small explicit ring (the pre-round-5
    2^17 default) so the wrap happens without feeding 33+ s."""
    wave = _wave(41, seconds=12.0)
    ring = 1 << 17

    session = models.create_session(mode="2pass")
    ref = _drive_session_basic(session, wave)

    eng = StreamEngine(models, capacity=2, ring_samples=ring)
    sid = eng.open()
    got = _drive(eng, sid, wave)
    # absolute position crossed the ring boundary
    assert eng._abs_fed[sid] > ring or len(wave) > ring
    assert _texts(got, "2pass-online") == _texts(ref, "2pass-online")
    assert _texts(got, "2pass-offline") == _texts(ref, "2pass-offline")
    assert _texts(got, "2pass-online")      # non-degenerate


def _drive_session_basic(session, wave, step_ms=600):
    out = []
    step = int(16000 * step_ms / 1000)
    for off in range(0, len(wave), step):
        res = session.feed(wave[off: off + step],
                           is_final=off + step >= len(wave))
        if res.partial:
            out.append({"mode": "2pass-online", "text": res.partial})
        if res.final_text:
            out.append({"mode": "2pass-offline", "text": res.final_text})
    return out


def test_engine_svs_hotword_context_per_slot(models):
    """Engine-batched SVS pass-2: a hotworded slot decodes through the
    context-biased beam while an un-hotworded slot in the SAME batch
    stays greedy (per-item contexts through recognize_batch)."""
    import dataclasses

    from asr2pass_tpu.config import sensevoice_tiny
    from asr2pass_tpu.models import sensevoice

    scfg = sensevoice_tiny()
    svocab = make_test_vocab(scfg.vocab_size)
    m = dataclasses.replace(
        models, svs_params=sensevoice.init(jax.random.PRNGKey(7), scfg),
        svs_cfg=scfg, svs_vocab=svocab)
    hot = svocab.id2token(7) + svocab.id2token(8)

    def text_of(res):
        return "".join(r["text"] for r in res if r["mode"] == "2pass-offline")

    w = _wave(5)
    plain_eng = StreamEngine(m, capacity=2)
    sid = plain_eng.open()
    plain = text_of(_drive(plain_eng, sid, w))

    eng = StreamEngine(m, capacity=2)
    a = eng.open(hotwords={hot: 90})
    b = eng.open()
    assert eng.slots[a].svs_context is not None
    assert eng.slots[b].svs_context is None
    ra, rb = [], []
    step = int(16000 * 0.6)
    for off in range(0, len(w), step):
        fin = off + step >= len(w)
        eng.feed(a, w[off: off + step], is_final=fin)
        eng.feed(b, w[off: off + step], is_final=fin)
        eng.step()
        ra.extend(eng.poll(a))
        rb.extend(eng.poll(b))
    for _ in range(3):
        eng.step()
        ra.extend(eng.poll(a))
        rb.extend(eng.poll(b))
    assert text_of(rb) == plain          # un-hotworded slot unchanged
    assert text_of(ra) != plain          # bias changed the hotworded slot
    assert hot in text_of(ra)


def _drive_collect(eng, sid, wave, extra_steps=6):
    out = []
    step = int(16000 * 0.6)
    for off in range(0, len(wave), step):
        eng.feed(sid, wave[off: off + step],
                 is_final=off + step >= len(wave))
        eng.step()
        out.extend(eng.poll(sid))
    for _ in range(extra_steps):
        eng.step()
        out.extend(eng.poll(sid))
    return out


def test_upload_overlap_engine_matches_plain(models):
    """VERDICT r4 item 3: the double-buffered staging upload changes
    WHEN bytes move, not WHAT the engine computes — overlap and plain
    fused-fetch engines produce identical partials and finals. The
    overlap path defers each staged buffer by one tick, so drive with
    drain steps until drained()."""
    w = _wave(7, seconds=2.2)

    plain = StreamEngine(models, capacity=2, fused_fetch=True)
    sp = plain.open()
    rp = _drive_collect(plain, sp, w)

    over = StreamEngine(models, capacity=2, fused_fetch=True,
                        upload_overlap=True)
    so = over.open()
    ro = _drive_collect(over, so, w)
    # drain anything still staged on the upload lane
    for _ in range(20):
        if over.drained(so) and not over.has_inflight():
            break
        over.step()
        ro.extend(over.poll(so))

    def text_of(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    assert text_of(ro, "2pass-online") == text_of(rp, "2pass-online")
    assert text_of(ro, "2pass-offline") == text_of(rp, "2pass-offline")
    over.shutdown()
    plain.shutdown()


def test_upload_overlap_reclaim_waits_for_staged_work(models):
    """A slot with STAGED-but-undispatched audio must not be reclaimed
    (its row would write the previous connection's audio into the fresh
    device ring): close() right after a feed, then the next open() must
    either land on the other slot or wait until the staged work settles;
    the new connection decodes cleanly either way."""
    eng = StreamEngine(models, capacity=1, fused_fetch=True,
                       upload_overlap=True)
    a = eng.open()
    eng.feed(a, _wave(8, seconds=0.6))
    eng.step()          # consumes the feed into the staged/next buffer
    eng.feed(a, _wave(8, seconds=0.6))
    eng.close(a)        # staged work for slot a may still be in flight
    # reclaim is gated on vd_inflight==0; drive ticks until it settles
    deadline = 40
    sid = None
    for _ in range(deadline):
        try:
            sid = eng.open()
            break
        except Exception:
            eng.step()
    assert sid is not None, "slot never reclaimed after staged work"
    res = _drive_collect(eng, sid, _wave(9))
    modes = {r["mode"] for r in res}
    assert "2pass-online" in modes
    eng.shutdown()


def test_decide_async_engine_matches_plain(models):
    """The fused tick's async-decide lane (VAD automaton/splitter on the
    collector thread) changes WHERE the host work runs, not the results:
    identical partials and finals vs the inline fused tick."""
    w = _wave(11, seconds=2.2)

    plain = StreamEngine(models, capacity=2, fused_fetch=True)
    sp = plain.open()
    rp = _drive_collect(plain, sp, w)

    da = StreamEngine(models, capacity=2, fused_fetch=True,
                      decide_async=True, upload_overlap=True)
    sd = da.open()
    rd = _drive_collect(da, sd, w)
    deadline = 100
    while deadline and not (da.drained(sd) and not da.has_inflight()):
        da.step()
        rd.extend(da.poll(sd))
        deadline -= 1

    def text_of(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    assert text_of(rd, "2pass-online") == text_of(rp, "2pass-online")
    assert text_of(rd, "2pass-offline") == text_of(rp, "2pass-offline")
    da.shutdown()
    plain.shutdown()


def test_ring_overrun_quarantine_recovers(models):
    """A slot whose pass-1 backlog outran the device audio ring is
    quarantined (backlog dropped, device columns + detok zeroed —
    batched, one clear per tick) and the STREAM keeps serving: the next
    utterance decodes cleanly instead of carrying stale encoder state."""
    from asr2pass_tpu.runtime.engine import _RING_SAMPLES

    eng = StreamEngine(models, capacity=2, fused_fetch=True)
    a = eng.open()
    r1 = _drive_collect(eng, a, _wave(21, seconds=1.2))
    assert any(r["mode"] == "2pass-online" for r in r1)
    slot = eng.slots[a]
    # inject a backlog whose oldest staged sample was overwritten; the
    # decide-side counters advance in lockstep with the feed counter in
    # production, so the injection must keep that invariant
    jump = _RING_SAMPLES + 100_000
    eng._abs_fed[a] += jump
    slot.vd_abs += jump
    slot.splitter_base += jump
    with eng._stage_lock:
        slot.p1_groups.append(
            (int(eng._abs_fed[a]) - _RING_SAMPLES - 50_000, 16000, True))
    eng.step()                      # quarantine fires in _asr_step
    assert not slot.p1_groups
    assert slot.p1_flush_at is None
    assert slot.p1_ring_w == slot.p1_ring_r
    # recovery: a fresh utterance on the same slot still produces
    # partials (clean online caches + detok)
    r2 = _drive_collect(eng, a, _wave(22, seconds=1.2))
    assert any(r["mode"] == "2pass-online" for r in r2)
    eng.shutdown()


def test_engine_pass2_serves_from_ring(models, monkeypatch):
    """Fresh segments decode from the device audio ring (zero re-upload):
    the lane's feats come from ring_frontend_device, and the upload path
    is never touched for a live stream."""
    import asr2pass_tpu.runtime.offline_asr as oa
    import asr2pass_tpu.runtime.streaming_frontend as sf

    calls = {"ring": 0, "upload": 0}
    real_ring = sf.ring_frontend_device

    def spy_ring(*a, **k):
        calls["ring"] += 1
        return real_ring(*a, **k)

    real_up = oa.offline_frontend_device

    def spy_up(*a, **k):
        calls["upload"] += 1
        return real_up(*a, **k)

    monkeypatch.setattr(sf, "ring_frontend_device", spy_ring)
    monkeypatch.setattr(oa, "offline_frontend_device", spy_up)
    eng = StreamEngine(models, capacity=2)
    sid = eng.open()
    res = _drive(eng, sid, _wave(31, seconds=2.5))
    assert any(r["mode"] == "2pass-offline" for r in res)
    assert calls["ring"] > 0
    assert calls["upload"] == 0
    eng.shutdown()


def test_engine_pass2_ring_fallback_equivalence(models):
    """With a ring too small for ring-served pass-2 (freshness margin
    can never hold), the lane falls back to the upload front-end — and
    the results are identical to the ring-served engine."""
    w = _wave(33, seconds=2.5)

    ring_served = StreamEngine(models, capacity=2)
    a = ring_served.open()
    ra = _drive(ring_served, a, w)

    # 2^16 = 4.1 s: plenty for pass-1, but far below the pass-2
    # freshness margin (16 * max_new) -> the lane always falls back
    tiny_ring = StreamEngine(models, capacity=2, ring_samples=1 << 16)
    b = tiny_ring.open()
    rb = _drive(tiny_ring, b, w)

    def text_of(res, mode):
        return "".join(r["text"] for r in res if r["mode"] == mode)

    assert text_of(rb, "2pass-online") == text_of(ra, "2pass-online")
    assert text_of(rb, "2pass-offline") == text_of(ra, "2pass-offline")
    assert text_of(ra, "2pass-offline")
    ring_served.shutdown()
    tiny_ring.shutdown()
