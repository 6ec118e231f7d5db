"""Native library parity tests (builds via make on first use; skips if no
toolchain)."""
import numpy as np
import pytest

from asr2pass_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native lib unavailable")


def test_native_resample_matches_python():
    from asr2pass_tpu.frontend.audio import linear_resample

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    ref = linear_resample(x, 44100, 16000)
    got = bindings.resample(x, 44100, 16000)
    assert got is not None
    assert abs(len(got) - len(ref)) <= 1
    n = min(len(got), len(ref))
    # interior matches closely (edges differ by padding convention)
    sl = slice(100, n - 100)
    np.testing.assert_allclose(got[sl], ref[sl], atol=2e-4)


def test_native_ac_bias_scores():
    # words over symbol ids: [1,2] and [1,3,4]
    ac = bindings.NativeAcBias([[1, 2], [1, 3, 4]], [2.0, 1.0])
    s, d = ac.step(0, 1)
    assert d == pytest.approx(2.0)  # first word's per-symbol score wins
    s2, d2 = ac.step(s, 2)
    assert d2 == pytest.approx(2.0)  # completes word [1,2]
    assert s2 == 0
    # partial then mismatch retracts
    s3, d3 = ac.step(0, 1)
    s4, d4 = ac.step(s3, 9)
    assert d4 == pytest.approx(-2.0)
    assert ac.final(s3) == pytest.approx(-2.0)


def test_native_ac_failure_transition():
    # overlapping words: [1,1,2]; feeding 1,1,1,2 must still match
    ac = bindings.NativeAcBias([[1, 1, 2]], [1.0])
    s = 0
    total = 0.0
    for sym in [1, 1, 1, 2]:
        s, d = ac.step(s, sym)
        total += d
    # net: matched the word once (3 symbols worth of score)
    assert total == pytest.approx(3.0)


def test_native_edit_align():
    ops, dist = bindings.edit_align([1, 2, 3], [1, 3])
    assert dist == 1
    assert ops.count(2) == 1        # one deletion
    ops, dist = bindings.edit_align([1, 2], [1, 2])
    assert dist == 0 and all(o == 0 for o in ops)
    ops, dist = bindings.edit_align([], [1, 2])
    assert dist == 2 and ops == [3, 3]


def _vad_machine(native: bool):
    """Build an E2EVadStateMachine pinned to one implementation."""
    from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions

    sm = E2EVadStateMachine(VadOptions())
    if not native:
        sm._native = None   # force the Python frame loop (the oracle)
    return sm


@pytest.mark.parametrize("online", [False, True])
def test_native_vad_matches_python(online):
    """The C++ automaton (e2e_vad.cc) must be decision-identical to the
    Python port across bursty random streams, chunked feeds, finals, and
    per-call overrides — segments and their online [s,-1]/[-1,e] splits."""
    for seed in range(6):
        rng_a = np.random.default_rng(seed)
        outs = {True: [], False: []}
        sms = {True: _vad_machine(True), False: _vad_machine(False)}
        if sms[True]._native is None:
            pytest.skip("native VAD unavailable")
        chunks = []
        n_chunks = 50
        for k in range(n_chunks):
            base = 0.05 if (k % 9) < 5 else 0.95
            scores = np.clip(base + rng_a.normal(0, 0.1, (64, 3)),
                             1e-4, 1 - 1e-4).astype(np.float32)
            amp = 0.2 if base < 0.5 else 0.01
            wav = rng_a.normal(0, amp, 64 * 160).astype(np.float32)
            # exercise mid-stream finals (utterance flush + reset) and
            # per-call overrides on some chunks
            fin = k in (24, n_chunks - 1)
            over = ({"max_end_sil": 500, "max_single_segment_time": 5000}
                    if k % 7 == 3 else {})
            chunks.append((scores, wav, fin, over))
        for native in (True, False):
            sm = sms[native]
            for scores, wav, fin, over in chunks:
                outs[native].append(
                    sm(scores, wav, is_final=fin, online=online, **over))
        assert outs[True] == outs[False]


def test_native_vad_speech_segments():
    """Sanity: clear speech in silence yields one [start, end] segment with
    plausible bounds through the native path."""
    sm = _vad_machine(True)
    if sm._native is None:
        pytest.skip("native VAD unavailable")
    rng = np.random.default_rng(1)
    segs = []
    for k in range(30):
        speech = 5 <= k < 20
        s = 0.02 if speech else 0.98
        scores = np.full((64, 1), s, np.float32)
        wav = rng.normal(0, 0.3 if speech else 0.005, 64 * 160)
        segs += sm(scores, wav.astype(np.float32),
                   is_final=(k == 29), online=False)
    assert len(segs) == 1
    start, end = segs[0]
    assert 2500 <= start <= 3600      # speech starts at frame 320 (3200ms)
    assert 12000 <= end <= 13600      # ends at frame 1280 (12800ms)


def test_native_ctc_beam_matches_python_spec():
    """native/src/ctc_beam.cc == decode/ctc._prefix_beam_over_frames on
    randomized pruned candidates — full n-best ids, scores AND viterbi
    times, with and without a hotword context graph (incl. the
    force-included-unit merge the serving path uses)."""
    import jax.numpy as jnp

    from asr2pass_tpu.decode.context_graph import ContextGraph
    from asr2pass_tpu.decode.ctc import ctc_prefix_beam_search_pruned
    from asr2pass_tpu.native import bindings as nb
    from asr2pass_tpu.parallel.ctc_shard import ctc_first_prune
    from asr2pass_tpu.text.vocab import make_test_vocab

    if not nb.available():
        pytest.skip("native lib unavailable")
    vocab = make_test_vocab(64)
    hot1 = vocab.id2token(7) + vocab.id2token(9)
    hot2 = vocab.id2token(7) + vocab.id2token(11) + vocab.id2token(12)
    cg = ContextGraph(context_score=3.0).build({hot1: None, hot2: 5.0})

    for seed in range(6):
        rng = np.random.default_rng(seed)
        t, v, k = 18, 64, 12
        logits = rng.standard_normal((t, v)).astype(np.float32) * 2.5
        cid, clp = ctc_first_prune(jnp.asarray(logits)[None], k=k)
        cid, clp = np.asarray(cid)[0], np.asarray(clp)[0]
        for ctx in (None, cg):
            kw = dict(beam=6, blank_id=0, context=ctx,
                      id_to_token=vocab.id2token,
                      token2id=vocab.token2id)
            py = ctc_prefix_beam_search_pruned(cid, clp, t,
                                               use_native=False, **kw)
            nat = ctc_prefix_beam_search_pruned(cid, clp, t,
                                                use_native=True, **kw)
            assert [p[0] for p in nat] == [p[0] for p in py], \
                (seed, ctx is not None)
            np.testing.assert_allclose([p[1] for p in nat],
                                       [p[1] for p in py], atol=1e-4)
            assert [p[2] for p in nat] == [p[2] for p in py]


def test_native_ctc_beam_hotword_outside_topk():
    """The serving combination: device prune hides a hotword unit, the
    merged candidate set restores it — through the NATIVE beam."""
    import jax.numpy as jnp

    from asr2pass_tpu.decode.context_graph import ContextGraph
    from asr2pass_tpu.decode.ctc import ctc_prefix_beam_search_pruned
    from asr2pass_tpu.native import bindings as nb
    from asr2pass_tpu.parallel.ctc_shard import ctc_first_prune, \
        ctc_gather_logp
    from asr2pass_tpu.runtime.sensevoice_asr import (
        _merge_candidates,
        context_unit_ids,
    )
    from asr2pass_tpu.text.vocab import make_test_vocab

    if not nb.available():
        pytest.skip("native lib unavailable")
    vocab = make_test_vocab(64)
    logp = np.full((2, 64), -12.0, np.float32)
    logp[0, 4] = -0.01
    logp[1, 6] = -0.40
    for j, tok in enumerate(range(20, 30)):
        logp[1, tok] = -0.60 - 0.001 * j
    logp[1, 5] = -0.80
    hot = vocab.id2token(4) + vocab.id2token(5)
    cg = ContextGraph(context_score=3.0).build({hot: None})
    logits = jnp.asarray(logp)[None]
    cid, clp = ctc_first_prune(logits, k=8)
    hw_ids = context_unit_ids(cg, vocab.token2id)
    hw_lp = np.asarray(ctc_gather_logp(
        logits, jnp.asarray(hw_ids, jnp.int32)))[0]
    mid, mlp = _merge_candidates(np.asarray(cid)[0], np.asarray(clp)[0],
                                 hw_ids, hw_lp)
    nat = ctc_prefix_beam_search_pruned(
        mid, mlp, 2, beam=4, blank_id=0, context=cg,
        id_to_token=vocab.id2token, token2id=vocab.token2id,
        use_native=True)
    assert nat[0][0] == [4, 5]


def test_native_ctc_beam_edge_shapes():
    """Edge shapes parity + no-crash: empty utterance, K=1, beam=1,
    all-blank frames, duplicate candidate ids."""
    from asr2pass_tpu.decode.ctc import ctc_prefix_beam_search_pruned
    from asr2pass_tpu.native import bindings as nb

    if not nb.available():
        pytest.skip("native lib unavailable")

    def both(cid, clp, t, **kw):
        py = ctc_prefix_beam_search_pruned(cid, clp, t,
                                           use_native=False, **kw)
        nat = ctc_prefix_beam_search_pruned(cid, clp, t,
                                            use_native=True, **kw)
        assert [p[0] for p in nat] == [p[0] for p in py]
        np.testing.assert_allclose([p[1] for p in nat],
                                   [p[1] for p in py], atol=1e-4)
        return nat

    z = np.zeros((1, 1), np.int32)
    zl = np.zeros((1, 1), np.float32)
    # empty utterance
    out = both(z, zl, 0, beam=1, blank_id=0)
    assert out[0][0] == []
    # K=1 all-blank
    cid = np.zeros((5, 1), np.int32)
    clp = np.full((5, 1), -0.01, np.float32)
    out = both(cid, clp, 5, beam=1, blank_id=0)
    assert out[0][0] == []
    # duplicate candidate ids in a frame (merge-candidates mask case)
    rng = np.random.default_rng(2)
    cid = rng.integers(0, 6, (8, 6)).astype(np.int32)
    clp = (rng.standard_normal((8, 6)) - 1).astype(np.float32)
    both(cid, clp, 8, beam=4, blank_id=0)
