"""SenseVoice model, CTC decoders, context graph, hotword compiler tests."""
import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import HotwordConfig, sensevoice_tiny
from asr2pass_tpu.decode.context_graph import ContextGraph
from asr2pass_tpu.decode.ctc import ctc_greedy, ctc_prefix_beam_search
from asr2pass_tpu.models import hotword as hw_mod
from asr2pass_tpu.models import sensevoice
from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline
from asr2pass_tpu.text.vocab import make_test_vocab


def test_ctc_greedy_collapse():
    v = 5
    seq = [0, 1, 1, 0, 2, 2, 2, 3, 0, 3]
    logits = np.full((len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logits[t, s] = 10.0
    ids, times = ctc_greedy(logits, len(seq), blank_id=0)
    assert ids == [1, 2, 3, 3]
    assert times == [1, 4, 7, 9]


def test_ctc_greedy_skip_first_meta():
    logits = np.full((6, 4), -10.0, np.float32)
    for t, s in enumerate([3, 3, 3, 3, 1, 2]):
        logits[t, s] = 10.0
    ids, _ = ctc_greedy(logits, 6, blank_id=0, skip_first=4)
    assert ids == [1, 2]


def test_prefix_beam_matches_greedy_on_peaked():
    rng = np.random.default_rng(0)
    v, t = 8, 12
    seq = [0, 3, 0, 5, 5, 0, 2, 0, 7, 0, 1, 0]
    logp = np.full((t, v), -15.0, np.float32)
    for i, s in enumerate(seq):
        logp[i, s] = -0.01
    nbest = ctc_prefix_beam_search(logp, t, beam=5, blank_id=0)
    greedy_ids, _ = ctc_greedy(logp, t, blank_id=0)
    assert nbest[0][0] == greedy_ids


def test_prefix_beam_repeat_handling():
    # a a (same token twice separated by blank) vs aa collapse
    logp = np.full((3, 3), -15.0, np.float32)
    logp[0, 1] = -0.01   # a
    logp[1, 0] = -0.01   # blank
    logp[2, 1] = -0.01   # a
    nbest = ctc_prefix_beam_search(logp, 3, beam=4, blank_id=0)
    assert nbest[0][0] == [1, 1]


def test_context_graph_boosts_hotword():
    cg = ContextGraph(context_score=5.0).build({"你好": None})
    s, d1, _ = cg.get_next_state(None, "你")
    assert d1 > 0
    s, d2, matched = cg.get_next_state(s, "好")
    assert matched
    # falling off a partial match retracts
    s2, d, _ = cg.get_next_state(None, "你")
    s3, dneg, _ = cg.get_next_state(s2, "再")
    assert dneg < 0
    assert abs(cg.final_retract(s2)) == d1


def test_context_graph_biases_beam_search():
    """With two near-tied hypotheses, the hotword boost must flip the
    winner."""
    vocab = make_test_vocab(8)
    # tokens 4,5 spell two CJK chars; make 4->5 and 4->6 nearly tied
    logp = np.full((2, 8), -12.0, np.float32)
    logp[0, 4] = -0.01
    logp[1, 5] = -0.70
    logp[1, 6] = -0.69   # slightly better without context
    plain = ctc_prefix_beam_search(logp, 2, beam=4, blank_id=0)
    assert plain[0][0] == [4, 6]
    hot = vocab.id2token(4) + vocab.id2token(5)
    cg = ContextGraph(context_score=3.0).build({hot: None})
    boosted = ctc_prefix_beam_search(logp, 2, beam=4, blank_id=0,
                                     context=cg,
                                     id_to_token=vocab.id2token)
    assert boosted[0][0] == [4, 5]


def test_sensevoice_forward_shapes():
    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 20, cfg.encoder.input_size)).astype(np.float32)
    out = sensevoice.apply(params, cfg, jnp.asarray(feats),
                           jnp.asarray([20, 15]),
                           jnp.asarray([3, 4]), jnp.asarray([14, 15]))
    assert out.logits.shape == (2, 24, cfg.vocab_size)
    assert int(out.lengths[0]) == 24 and int(out.lengths[1]) == 19


def test_sensevoice_recognizer_end_to_end():
    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    rec = SenseVoiceOffline(params, cfg, make_test_vocab(cfg.vocab_size),
                            lang="zh")
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    text, ts = rec.recognize(wave)
    assert isinstance(text, str)
    # language id changes the meta conditioning -> usually different output
    rec.set_lang("en")
    text_en, _ = rec.recognize(wave)
    assert isinstance(text_en, str)


def test_hotword_compiler_shapes():
    cfg = HotwordConfig(vocab_size=64, embed_dim=16, hidden_dim=16)
    params = hw_mod.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(64)
    words = [vocab.id2token(10) + vocab.id2token(11), vocab.id2token(12)]
    emb = hw_mod.compile_hotwords(params, cfg, words, vocab)
    assert emb.shape == (3, 16)  # null + 2 hotwords
    # different lengths produce different rows
    assert not np.allclose(emb[1], emb[2])


def test_hotword_tokenize_mixed():
    vocab = make_test_vocab(64)
    ids = hw_mod.tokenize_hotword(vocab.id2token(5) + "abc", vocab)
    assert len(ids) == 2  # CJK char + <unk> latin word


def test_device_first_prune_matches_host():
    """ON-DEVICE first-prune (plain + vocab-sharded over the tp mesh with
    collective candidate exchange) returns the same candidate sets the
    host beam would take from the full [T, V] log-softmax rows."""
    from asr2pass_tpu.parallel.ctc_shard import (
        ctc_first_prune,
        ctc_first_prune_sharded,
    )
    from asr2pass_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(7)
    b, t, v, k = 2, 12, 64, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    ids_p, sc_p = ctc_first_prune(jnp.asarray(logits), k=k)
    mesh = make_mesh(8, tp=8)
    ids_s, sc_s = ctc_first_prune_sharded(jnp.asarray(logits), mesh,
                                          "tp", k=k)
    for ids, sc in ((np.asarray(ids_p), np.asarray(sc_p)),
                    (np.asarray(ids_s), np.asarray(sc_s))):
        for bi in range(b):
            for ti in range(t):
                want = set(np.argsort(logp[bi, ti])[-k:].tolist())
                assert set(ids[bi, ti].tolist()) == want
                np.testing.assert_allclose(
                    np.sort(sc[bi, ti]),
                    np.sort(logp[bi, ti][list(want)]), atol=1e-5)


def test_pruned_beam_matches_full_beam():
    """ctc_prefix_beam_search_pruned over device-pruned candidates ==
    ctc_prefix_beam_search over full rows with first_beam = k."""
    from asr2pass_tpu.decode.ctc import (
        ctc_prefix_beam_search,
        ctc_prefix_beam_search_pruned,
    )
    from asr2pass_tpu.parallel.ctc_shard import ctc_first_prune

    rng = np.random.default_rng(11)
    t, v, k = 16, 40, 12
    logits = rng.standard_normal((t, v)).astype(np.float32) * 2.0
    logp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            ).astype(np.float32)
    full = ctc_prefix_beam_search(logp, t, beam=6, first_beam=k)
    ids, sc = ctc_first_prune(jnp.asarray(logits)[None], k=k)
    pruned = ctc_prefix_beam_search_pruned(
        np.asarray(ids)[0], np.asarray(sc)[0], t, beam=6)
    assert [p[0] for p in pruned] == [p[0] for p in full]
    np.testing.assert_allclose([p[1] for p in pruned],
                               [p[1] for p in full], atol=1e-4)


def test_sensevoice_tp_sharded_beam_decode():
    """North-star sharded-decode clause: a SenseVoice beam decode through
    a tp-sharded model — params Megatron-sharded AND the beam's per-frame
    candidate sets assembled via collectives — produces the same text as
    the unsharded beam decode."""
    from asr2pass_tpu.parallel.sharding import make_mesh

    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    rng = np.random.default_rng(5)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    ref = SenseVoiceOffline(params, cfg, vocab, lang="zh", beam=4)
    (want, _, ref_meta), = ref.recognize_batch([wave], with_meta=True)

    mesh = make_mesh(8, tp=8)        # vocab 64 % 8 == 0 -> sharded prune
    tp = SenseVoiceOffline(params, cfg, vocab, lang="zh", beam=4,
                           tp_mesh=mesh)
    (got, _, tp_meta), = tp.recognize_batch([wave], with_meta=True)
    assert got == want
    assert tp_meta == ref_meta


def test_device_greedy_collapse_semantics():
    """models/sensevoice.greedy_ids collapses repeats, strips blanks and
    the meta prefix, and masks past lengths — the CTCSearch semantics
    (sensevoice-small.cpp:323-377) computed on device."""
    from asr2pass_tpu.models.sensevoice import NUM_META, SenseVoiceOutput

    v = 6
    seq = [0, 1, 1, 0, 2, 2, 2, 3, 0, 3]
    t = NUM_META + len(seq)
    logits = np.full((2, t, v), -10.0, np.float32)
    for row in range(2):
        for j in range(NUM_META):
            logits[row, j, 5] = 10.0          # meta-position argmax = 5
        for j, s in enumerate(seq):
            logits[row, NUM_META + j, s] = 10.0
    # row 1 is shorter: frames past lengths[1] must be ignored
    out = SenseVoiceOutput(logits=jnp.asarray(logits),
                           lengths=jnp.asarray([t, NUM_META + 5]))
    ids, counts, meta = sensevoice.greedy_ids(out, blank_id=0)
    ids, counts, meta = np.asarray(ids), np.asarray(counts), np.asarray(meta)
    assert [int(x) for x in ids[0, : counts[0]]] == [1, 2, 3, 3]
    assert [int(x) for x in ids[1, : counts[1]]] == [1, 2]
    assert meta.shape == (2, sensevoice.NUM_META)
    assert (meta == 5).all()


def test_device_greedy_matches_host_on_model_output():
    """greedy_ids over a real model forward == ctc_greedy on the fetched
    logits, for every row of a padded batch."""
    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((3, 24, cfg.encoder.input_size)
                                ).astype(np.float32)
    lengths = jnp.asarray([24, 17, 9])
    out = sensevoice.apply(params, cfg, jnp.asarray(feats), lengths,
                           jnp.asarray([3, 4, 0]), jnp.asarray([14, 15, 14]))
    ids, counts, meta = sensevoice.greedy_ids(out, blank_id=cfg.blank_id)
    logits = np.asarray(out.logits)
    lens = np.asarray(out.lengths)
    for k in range(3):
        want, _ = ctc_greedy(logits[k], int(lens[k]),
                             blank_id=cfg.blank_id,
                             skip_first=sensevoice.NUM_META)
        n = int(np.asarray(counts)[k])
        assert [int(x) for x in np.asarray(ids)[k, :n]] == want
        assert list(np.asarray(meta)[k]) == \
            list(np.argmax(logits[k, :sensevoice.NUM_META], -1))


def test_pruned_beam_hotword_outside_topk():
    """VERDICT r4 item 8: a hotword whose next unit falls OUTSIDE the
    device top-k must still win — its unit ids are force-included into
    the candidate set with their true log-probs (the reference biases the
    FULL-vocab beam, ctc-prefix-decoder.cpp:280-299)."""
    from asr2pass_tpu.decode.ctc import (
        ctc_prefix_beam_search,
        ctc_prefix_beam_search_pruned,
    )
    from asr2pass_tpu.parallel.ctc_shard import ctc_first_prune, \
        ctc_gather_logp
    from asr2pass_tpu.runtime.sensevoice_asr import (
        _merge_candidates,
        context_unit_ids,
    )

    vocab = make_test_vocab(64)
    k = 8
    # frame 0: token 4 dominant. frame 1: token 6 best; the hotword's
    # second unit (token 5) is ranked ~12th — outside the k=8 prune.
    logp = np.full((2, 64), -12.0, np.float32)
    logp[0, 4] = -0.01
    logp[1, 6] = -0.40
    for j, tok in enumerate(range(20, 30)):    # 10 fillers above token 5
        logp[1, tok] = -0.60 - 0.001 * j
    logp[1, 5] = -0.80
    hot = vocab.id2token(4) + vocab.id2token(5)
    cg = ContextGraph(context_score=3.0).build({hot: None})

    full = ctc_prefix_beam_search(logp, 2, beam=4, blank_id=0, context=cg,
                                  id_to_token=vocab.id2token)
    assert full[0][0] == [4, 5]          # reference behavior: bias wins

    logits = jnp.asarray(logp)[None]
    cid, clp = ctc_first_prune(logits, k=k)
    cid, clp = np.asarray(cid)[0], np.asarray(clp)[0]
    assert 5 not in cid[1]               # the prune really hid the unit
    naked = ctc_prefix_beam_search_pruned(cid, clp, 2, beam=4, blank_id=0,
                                          context=cg,
                                          id_to_token=vocab.id2token)
    assert naked[0][0] != [4, 5]         # the failure mode being fixed

    hw_ids = context_unit_ids(cg, vocab.token2id)
    assert 5 in hw_ids
    hw_lp = np.asarray(ctc_gather_logp(
        logits, jnp.asarray(hw_ids, jnp.int32)))[0]
    mid, mlp = _merge_candidates(cid, clp, hw_ids, hw_lp)
    merged = ctc_prefix_beam_search_pruned(mid, mlp, 2, beam=4, blank_id=0,
                                           context=cg,
                                           id_to_token=vocab.id2token)
    assert merged[0][0] == [4, 5]    # force-include restores the win


def test_recognizer_per_item_contexts():
    """recognize_batch(contexts=...) biases ONLY the items that carry a
    context graph (the engine batches differently-configured connections
    together); greedy items ride the on-device ids."""
    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    rec = SenseVoiceOffline(params, cfg, vocab, lang="zh")
    rng = np.random.default_rng(4)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base, _ = rec.recognize(wave)
    hot = vocab.id2token(7) + vocab.id2token(8)
    cg = ContextGraph(context_score=90.0).build({hot: None})
    outs = rec.recognize_batch([wave, wave], contexts=[cg, None])
    assert outs[1][0] == base            # un-contexted item unchanged
    assert outs[0][0] != base            # a strong bias changes the text


def test_svs_tlg_rescoring_end_to_end(tmp_path):
    """SenseVoice + TLG WFST rescoring (the reference's BeamSearch path,
    sensevoice-small.cpp:442-494): a CTC-topology graph
    (build_tlg --ctc-blank) constrains the SVS decode to the graph's
    lexicon; the recognizer fetches full logits ONLY for LM items and a
    mixed batch keeps non-LM items on the device-greedy path."""
    import pytest as _pytest

    from asr2pass_tpu.decode.ngram import NgramLM
    from asr2pass_tpu.decode.tlg import TlgDecoder
    from asr2pass_tpu.native.bindings import available
    from asr2pass_tpu.tools.build_tlg import build_tlg

    if not available():
        _pytest.skip("native lib unavailable")
    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    t = vocab.id2token
    words = [t(7) + t(9), t(10) + t(11), t(12) + t(13)]
    lm = NgramLM.train([[w] for w in words] * 2, order=2)
    gdir = str(tmp_path / "svs_graph")
    build_tlg(lm, {w: list(w) for w in words}, gdir, ctc_blank="<blank>")
    tlg = TlgDecoder(gdir, vocab.token2id, lm_weight=0.5)

    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base_rec = SenseVoiceOffline(params, cfg, vocab, lang="zh")
    base, _ = base_rec.recognize(wave)

    rec = SenseVoiceOffline(params, cfg, vocab, lang="zh",
                            lm_decoder=tlg)
    text, _ = rec.recognize(wave)
    allowed = set("".join(words))
    assert isinstance(text, str)
    assert set(text) <= allowed          # constrained to the graph
    # mixed batch: per-item lm_decoders — item 0 constrained, item 1
    # rides the on-device greedy path unchanged
    tlg2 = TlgDecoder(gdir, vocab.token2id, lm_weight=0.5)
    outs = base_rec.recognize_batch([wave, wave],
                                    lm_decoders=[tlg2, None])
    assert set(outs[0][0]) <= allowed
    assert outs[1][0] == base


def test_server_models_svs_tlg_wiring(tmp_path):
    """--lm-dir (TLG) + --svs-dir compose: the SVS recognizer gets a
    per-vocab TLG decoder; the engine's per-slot decoders come from the
    svs cache slot (different ilabel gather map than the Paraformer's)."""
    import pytest as _pytest

    from asr2pass_tpu.config import VadConfig, paraformer_tiny
    from asr2pass_tpu.decode.ngram import NgramLM
    from asr2pass_tpu.models import fsmn_vad, paraformer
    from asr2pass_tpu.native.bindings import available
    from asr2pass_tpu.server.engine import ServerModels
    from asr2pass_tpu.tools.build_tlg import build_tlg

    if not available():
        _pytest.skip("native lib unavailable")
    cfg = sensevoice_tiny()
    vocab = make_test_vocab(cfg.vocab_size)
    t = vocab.id2token
    words = [t(7) + t(9), t(10) + t(11)]
    lm = NgramLM.train([[w] for w in words] * 2, order=2)
    gdir = str(tmp_path / "graph")
    build_tlg(lm, {w: list(w) for w in words}, gdir, ctc_blank="<blank>")

    acfg = paraformer_tiny()
    m = ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg, vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
        svs_params=sensevoice.init(jax.random.PRNGKey(7), cfg),
        svs_cfg=cfg, svs_vocab=vocab, tlg_dir=gdir)
    rec = m.create_offline_recognizer(use_svs=True)
    assert rec.asr.lm_decoder is not None
    res = rec.transcribe(
        (np.random.default_rng(5).standard_normal(16000) * 0.1
         ).astype(np.float32))
    assert set(res.text) <= set("".join(words)) | {" "}


def test_fused_prune_gather_matches_separate():
    """ctc_first_prune_gather (one log-softmax pass) == separate
    ctc_first_prune + ctc_gather_logp dispatches."""
    from asr2pass_tpu.parallel.ctc_shard import (
        ctc_first_prune,
        ctc_first_prune_gather,
        ctc_gather_logp,
    )

    rng = np.random.default_rng(23)
    logits = jnp.asarray(rng.standard_normal((2, 9, 40))
                         .astype(np.float32) * 2.0)
    ids = [3, 17, 25, 38]
    cid0, clp0 = ctc_first_prune(logits, k=8)
    hw0 = ctc_gather_logp(logits, jnp.asarray(ids, jnp.int32))
    cid1, clp1, hw1 = ctc_first_prune_gather(logits, ids, k=8)
    np.testing.assert_array_equal(np.asarray(cid0), np.asarray(cid1))
    np.testing.assert_allclose(np.asarray(clp0), np.asarray(clp1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hw0), np.asarray(hw1),
                               atol=1e-6)
