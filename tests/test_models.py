"""Model-core tests: CIF parity vs the reference scalar loop, streaming
FSMN-cache decode == full-sequence decode, encoder masking invariance, and
end-to-end offline Paraformer shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr2pass_tpu.config import PredictorConfig, paraformer_tiny
from asr2pass_tpu.models import cif, paraformer, sanm_decoder, sanm_encoder
from asr2pass_tpu.models.layers import length_mask, sinusoidal_posenc
from asr2pass_tpu.text.vocab import make_test_vocab


def ref_cif_loop(hidden, alphas, threshold, state=None):
    """Scalar port of the reference CifSearch inner loop
    (paraformer-online.cpp:301-340)."""
    d = hidden.shape[1]
    integrate = 0.0 if state is None else state[0]
    frames = np.zeros(d) if state is None else state[1].copy()
    out = []
    for alpha, h in zip(alphas, hidden):
        if alpha + integrate < threshold:
            integrate += alpha
            frames += alpha * h
        else:
            frames += (threshold - integrate) * h
            out.append(frames.copy())
            integrate += alpha
            integrate -= threshold
            frames = integrate * h
    return out, (integrate, frames)


def test_cif_fire_matches_reference_loop():
    rng = np.random.default_rng(0)
    t, d = 37, 8
    hidden = rng.standard_normal((t, d)).astype(np.float32)
    alphas = rng.uniform(0, 0.7, t).astype(np.float32)
    ref_out, (ref_integ, ref_frames) = ref_cif_loop(hidden, alphas, 1.0)
    frames, counts, fires, state = cif.fire(
        hidden[None], alphas[None], 1.0
    )
    n = int(counts[0])
    assert n == len(ref_out)
    got = np.asarray(frames[0, :n])
    np.testing.assert_allclose(got, np.stack(ref_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(state.integrate[0]), ref_integ,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.frame[0]), ref_frames,
                               rtol=1e-3, atol=1e-5)


def test_cif_streaming_chunks_match_offline():
    """Carrying CifState across chunks must reproduce the single pass."""
    rng = np.random.default_rng(1)
    t, d = 48, 4
    hidden = rng.standard_normal((1, t, d)).astype(np.float32)
    alphas = rng.uniform(0, 0.6, (1, t)).astype(np.float32)
    full_frames, full_counts, _, _ = cif.fire(hidden, alphas, 1.0)
    state = None
    got = []
    for s in range(0, t, 12):
        fr, cnt, _, state = cif.fire(hidden[:, s:s + 12], alphas[:, s:s + 12],
                                     1.0, state)
        got.append(np.asarray(fr[0, : int(cnt[0])]))
    got = np.concatenate(got, axis=0)
    n = int(full_counts[0])
    assert got.shape[0] == n
    np.testing.assert_allclose(got, np.asarray(full_frames[0, :n]),
                               rtol=1e-4, atol=1e-5)


def test_cif_tail_fires_final_token():
    """tail_threshold appends a tail fire for the remainder (is_last_chunk
    path of CifSearch)."""
    hidden = np.ones((1, 4, 3), dtype=np.float32)
    alphas = np.full((1, 4), 0.9, dtype=np.float32)
    # 3.6 total alpha -> 3 full fires, remainder 0.6; +0.45 tail >= 1.0
    # pushes the partial final token out (is_last_chunk tail fire)
    frames_no_tail, counts_no_tail, _, _ = cif.fire(hidden, alphas, 1.0)
    assert int(counts_no_tail[0]) == 3
    frames, counts, _ = cif.fire_offline(hidden, alphas, 1.0, 0.45)
    assert int(counts[0]) == 4


def test_peaks_from_alphas():
    us = np.zeros((1, 10), dtype=np.float32)
    us[0, [2, 5, 9]] = 1.0
    peaks = np.asarray(cif.peaks_from_alphas(jnp.asarray(us), 1.0))
    np.testing.assert_array_equal(np.nonzero(peaks[0])[0], [2, 5, 9])


@pytest.fixture(scope="module")
def tiny():
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_paraformer_offline_shapes(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    b, t = 2, 30
    feats = rng.standard_normal((b, t, cfg.encoder.input_size)).astype(np.float32)
    lengths = jnp.asarray([30, 21])
    out = paraformer.apply(params, cfg, jnp.asarray(feats), lengths)
    assert out.logits.shape[0] == b
    assert out.logits.shape[2] == cfg.vocab_size
    ids, counts = paraformer.greedy_ids(out)
    assert ids.shape[0] == b
    assert int(counts[0]) >= 1
    # detokenize smoke
    vocab = make_test_vocab(cfg.vocab_size)
    text = vocab.to_string(np.asarray(ids[0, : int(counts[0])]))
    assert isinstance(text, str)


def test_paraformer_padding_invariance(tiny):
    """Padding frames beyond `lengths` must not change the result."""
    cfg, params = tiny
    rng = np.random.default_rng(3)
    t = 24
    feats = rng.standard_normal((1, t, cfg.encoder.input_size)).astype(np.float32)
    lengths = jnp.asarray([t])
    out1 = paraformer.apply(params, cfg, jnp.asarray(feats), lengths)
    padded = np.concatenate(
        [feats, rng.standard_normal((1, 8, cfg.encoder.input_size)).astype(np.float32)],
        axis=1,
    )
    out2 = paraformer.apply(params, cfg, jnp.asarray(padded), lengths)
    n = int(out1.token_num[0])
    assert int(out2.token_num[0]) == n
    np.testing.assert_allclose(
        np.asarray(out1.logits[0, :n]), np.asarray(out2.logits[0, :n]),
        rtol=2e-3, atol=2e-4,
    )


def test_decoder_streaming_matches_offline(tiny):
    """FSMN-cache chunked decode == one-shot causal decode."""
    cfg, params = tiny
    rng = np.random.default_rng(4)
    d = cfg.encoder.output_size
    enc = rng.standard_normal((1, 20, d)).astype(np.float32)
    u = 12
    ac = rng.standard_normal((1, u, d)).astype(np.float32)
    full = sanm_decoder.apply(params["decoder"], jnp.asarray(ac),
                              jnp.asarray(enc))
    caches = sanm_decoder.init_caches(params["decoder"], 1)
    outs = []
    for s in range(0, u, 4):
        chunk = jnp.asarray(ac[:, s:s + 4])
        logits, caches = sanm_decoder.apply_streaming(
            params["decoder"], chunk, jnp.asarray(enc), caches
        )
        outs.append(np.asarray(logits))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-3, atol=2e-4)


def test_decoder_streaming_padded_chunks(tiny):
    """Padded chunks with valid_len must advance caches correctly."""
    cfg, params = tiny
    rng = np.random.default_rng(5)
    d = cfg.encoder.output_size
    enc = rng.standard_normal((1, 16, d)).astype(np.float32)
    u = 6
    ac = rng.standard_normal((1, u, d)).astype(np.float32)
    full = sanm_decoder.apply(params["decoder"], jnp.asarray(ac),
                              jnp.asarray(enc))
    caches = sanm_decoder.init_caches(params["decoder"], 1)
    got = []
    # feed in chunks of valid sizes 2, 1, 3 padded to width 4
    for s, n in [(0, 2), (2, 1), (3, 3)]:
        chunk = np.zeros((1, 4, d), dtype=np.float32)
        chunk[:, :n] = ac[:, s:s + n]
        mask = length_mask(jnp.asarray([n]), 4)
        logits, caches = sanm_decoder.apply_streaming(
            params["decoder"], jnp.asarray(chunk), jnp.asarray(enc), caches,
            mask=mask, valid_len=jnp.asarray([n]),
        )
        got.append(np.asarray(logits[:, :n]))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-3, atol=2e-4)


def test_posenc_matches_reference_formula():
    """sinusoidal_posenc == the C++ GetPosEmb loop
    (paraformer-online.cpp:240-268)."""
    depth, start, t = 560, 7, 5
    ours = np.asarray(sinusoidal_posenc(start, t, depth))
    scale = -np.log(10000.0) / (depth // 2 - 1)
    ref = np.zeros((start + t, depth), dtype=np.float64)
    for i in range(depth // 2):
        tmptime = np.exp(i * scale)
        for j in range(start + t):
            coe = tmptime * (j + 1)
            ref[j, i] = np.sin(coe)
            ref[j, i + depth // 2] = np.cos(coe)
    np.testing.assert_allclose(ours, ref[start: start + t], rtol=1e-4,
                               atol=1e-5)


def test_encoder_posenc_continuity(tiny):
    """pos_start makes chunked pos-emb identical to the full pass."""
    cfg, params = tiny
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((1, 12, cfg.encoder.input_size)).astype(np.float32)
    full = sinusoidal_posenc(0, 12, cfg.encoder.input_size)
    part = np.concatenate([
        np.asarray(sinusoidal_posenc(0, 5, cfg.encoder.input_size)),
        np.asarray(sinusoidal_posenc(5, 7, cfg.encoder.input_size)),
    ])
    np.testing.assert_allclose(part, np.asarray(full), rtol=1e-5, atol=1e-6)


def test_int8_quantized_forward_agrees(tiny):
    """int8 weight+activation path tracks fp32 (greedy ids mostly equal)."""
    from asr2pass_tpu.utils import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((1, 24, cfg.encoder.input_size)).astype(np.float32)
    o1 = paraformer.apply(params, cfg, jnp.asarray(feats), jnp.asarray([24]))
    o2 = paraformer.apply(qparams, cfg, jnp.asarray(feats), jnp.asarray([24]))
    n1, n2 = int(o1.token_num[0]), int(o2.token_num[0])
    assert abs(n1 - n2) <= 1
    ids1 = np.asarray(jnp.argmax(o1.logits, -1))[0, :min(n1, n2)]
    ids2 = np.asarray(jnp.argmax(o2.logits, -1))[0, :min(n1, n2)]
    assert (ids1 == ids2).mean() >= 0.9


def test_int8_weight_only_forward_agrees(tiny):
    """w8a16 (weight-only int8) path tracks fp32 even tighter than w8a8 —
    activations never quantize, so logits stay close."""
    from asr2pass_tpu.utils import quantize_params

    cfg, params = tiny
    qparams = quantize_params(params, weight_only=True)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((1, 24, cfg.encoder.input_size)).astype(np.float32)
    o1 = paraformer.apply(params, cfg, jnp.asarray(feats), jnp.asarray([24]))
    o2 = paraformer.apply(qparams, cfg, jnp.asarray(feats), jnp.asarray([24]))
    n1, n2 = int(o1.token_num[0]), int(o2.token_num[0])
    assert abs(n1 - n2) <= 1
    ids1 = np.asarray(jnp.argmax(o1.logits, -1))[0, :min(n1, n2)]
    ids2 = np.asarray(jnp.argmax(o2.logits, -1))[0, :min(n1, n2)]
    assert (ids1 == ids2).mean() >= 0.9
