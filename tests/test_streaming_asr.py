"""Streaming Paraformer tests: chunk-feed invariance, batched step
mechanics, state reset."""
import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import paraformer_tiny
from asr2pass_tpu.models import paraformer, paraformer_online
from asr2pass_tpu.runtime.asr_stream import ParaformerOnlineStream
from asr2pass_tpu.text.vocab import make_test_vocab


def _setup():
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    return cfg, params, vocab


def test_chunk_feed_invariance():
    """800-sample drip vs 9600-sample chunks must give identical text —
    the engine's 50 ms network step (websocket-server-2pass.cpp:570-572)
    cannot change results."""
    cfg, params, vocab = _setup()
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(32000) * 0.1).astype(np.float32)

    s1 = ParaformerOnlineStream(params, cfg, make_test_vocab(cfg.vocab_size))
    t1 = ""
    for off in range(0, len(wave), 9600):
        t1 += s1.accept(wave[off: off + 9600],
                        is_final=off + 9600 >= len(wave))

    s2 = ParaformerOnlineStream(params, cfg, make_test_vocab(cfg.vocab_size))
    t2 = ""
    for off in range(0, len(wave), 800):
        t2 += s2.accept(wave[off: off + 800],
                        is_final=off + 800 >= len(wave))

    assert t1 == t2
    assert len(t1) > 0  # random weights still fire plenty of tokens


def test_stream_reusable_after_final():
    cfg, params, vocab = _setup()
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    s = ParaformerOnlineStream(params, cfg, vocab)
    a = s.accept(wave, is_final=True)
    b = s.accept(wave, is_final=True)
    assert a == b


def test_batched_step_isolates_streams():
    """Two streams stepped together must match the same streams stepped
    alone (state isolation in the batched pytree)."""
    cfg, params, _ = _setup()
    rng = np.random.default_rng(2)
    lfr = cfg.frontend.lfr_dim
    center = cfg.chunk_size[1]
    f1 = rng.standard_normal((2, center, lfr)).astype(np.float32)
    counts = jnp.asarray([center, center], jnp.int32)
    fin = jnp.asarray([False, False])

    state2 = paraformer_online.init_state(params, cfg, 2)
    state2, ids2, n2 = paraformer_online.step(
        params, cfg, state2, jnp.asarray(f1), counts, fin
    )

    for b in range(2):
        s1 = paraformer_online.init_state(params, cfg, 1)
        s1, ids1, n1 = paraformer_online.step(
            params, cfg, s1, jnp.asarray(f1[b: b + 1]),
            jnp.asarray([center], jnp.int32), jnp.asarray([False]),
        )
        assert int(n1[0]) == int(n2[b])
        k = int(n1[0])
        np.testing.assert_array_equal(np.asarray(ids1[0, :k]),
                                      np.asarray(ids2[b, :k]))


def test_final_resets_state_slot():
    cfg, params, _ = _setup()
    rng = np.random.default_rng(3)
    lfr = cfg.frontend.lfr_dim
    center = cfg.chunk_size[1]
    feats = rng.standard_normal((1, center, lfr)).astype(np.float32)
    state = paraformer_online.init_state(params, cfg, 1)
    state, _, _ = paraformer_online.step(
        params, cfg, state, jnp.asarray(feats),
        jnp.asarray([center], jnp.int32), jnp.asarray([True]),
    )
    zero = paraformer_online.init_state(params, cfg, 1)
    np.testing.assert_allclose(np.asarray(state.feats_cache),
                               np.asarray(zero.feats_cache))
    assert int(state.pos[0]) == 0
    np.testing.assert_allclose(np.asarray(state.cif_integrate), 0.0)
