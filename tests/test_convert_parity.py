"""Converted-layout equivalence: FunASR torch-layout state dicts, run
through tools/convert_funasr.convert_state_dict into our JAX Paraformer,
must reproduce the FunASR-faithful numpy forward (tests/funasr_numpy_ref)
logit-for-logit.

This is the proof (without real weights in this environment) that a
converted real checkpoint — e.g. the paraformer-large dir the reference
auto-downloads (funasr-wss-server-2pass.cpp:195-502) — is numerically
faithful: same encoder/CIF/decoder math as the ONNX graphs the reference
drives at paraformer.cpp:463-589.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from asr2pass_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    ParaformerConfig,
    PredictorConfig,
)
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.tools.convert_funasr import convert_state_dict

from funasr_numpy_ref import make_state_dict, paraformer_forward

D_IN, D, ENC_L, DEC_L, FFN, VOCAB, HEADS = 20, 16, 3, 2, 40, 23, 2
ENC_K = DEC_K = 5


def _cfg(timestamp=False):
    return ParaformerConfig(
        encoder=EncoderConfig(input_size=D_IN, output_size=D,
                              num_blocks=ENC_L, attention_heads=HEADS,
                              linear_units=FFN, kernel_size=ENC_K),
        decoder=DecoderConfig(num_blocks=DEC_L, attention_heads=HEADS,
                              linear_units=FFN, kernel_size=DEC_K,
                              sanm_shift=0),   # FunASR offline: centered
        predictor=PredictorConfig(idim=D, use_timestamp=timestamp),
        vocab_size=VOCAB,
    )


def _run_both(timestamp=False, seed=0, t=25):
    rng = np.random.default_rng(seed)
    sd = make_state_dict(rng, d_in=D_IN, d_model=D, enc_blocks=ENC_L,
                         dec_blocks=DEC_L, ffn_dim=FFN, vocab=VOCAB,
                         enc_kernel=ENC_K, dec_kernel=DEC_K,
                         timestamp=timestamp)
    feats = rng.standard_normal((t, D_IN)).astype(np.float32)
    ref_logits, ref_n, ref_us, ref_peaks = paraformer_forward(
        sd, feats, d_model=D, enc_blocks=ENC_L, dec_blocks=DEC_L,
        heads=HEADS, enc_kernel=ENC_K, dec_kernel=DEC_K,
        timestamp=timestamp)

    params = convert_state_dict(sd)
    out = paraformer.apply(params, _cfg(timestamp), jnp.asarray(feats[None]),
                           jnp.asarray([t], jnp.int32))
    return (ref_logits, ref_n, ref_us, ref_peaks), out


def test_standard_paraformer_logit_parity():
    (ref_logits, ref_n, _, _), out = _run_both()
    n = int(out.token_num[0])
    assert n == ref_n, f"token counts differ: {n} vs {ref_n}"
    assert n > 2, "degenerate test: too few CIF fires"
    got = np.asarray(out.logits[0, :n])
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)
    # greedy transcription identical
    np.testing.assert_array_equal(got.argmax(-1), ref_logits.argmax(-1))


def test_timestamp_paraformer_us_parity():
    (ref_logits, ref_n, ref_us, ref_peaks), out = _run_both(timestamp=True,
                                                            seed=1)
    n = int(out.token_num[0])
    assert n == ref_n
    np.testing.assert_allclose(np.asarray(out.logits[0, :n]), ref_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.us_alphas[0]), ref_us,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.us_cif_peak[0]), ref_peaks,
                               rtol=1e-4, atol=1e-5)


def test_padded_batch_matches_solo():
    """Batched padded inference must equal per-utterance inference — the
    TPU path batches VAD segments (FetchDynamic role, audio.cpp:1052-1108)
    so padding must be inert (tail fire at each row's own valid length)."""
    rng = np.random.default_rng(2)
    sd = make_state_dict(rng, d_in=D_IN, d_model=D, enc_blocks=ENC_L,
                         dec_blocks=DEC_L, ffn_dim=FFN, vocab=VOCAB,
                         enc_kernel=ENC_K, dec_kernel=DEC_K)
    params = convert_state_dict(sd)
    cfg = _cfg()
    t1, t2 = 18, 30
    f1 = rng.standard_normal((t1, D_IN)).astype(np.float32)
    f2 = rng.standard_normal((t2, D_IN)).astype(np.float32)
    batch = np.zeros((2, t2, D_IN), np.float32)
    batch[0, :t1] = f1
    batch[1] = f2
    out_b = paraformer.apply(params, cfg, jnp.asarray(batch),
                             jnp.asarray([t1, t2], jnp.int32))
    out_1 = paraformer.apply(params, cfg, jnp.asarray(f1[None]),
                             jnp.asarray([t1], jnp.int32))
    n = int(out_1.token_num[0])
    assert int(out_b.token_num[0]) == n
    np.testing.assert_allclose(np.asarray(out_b.logits[0, :n]),
                               np.asarray(out_1.logits[0, :n]),
                               rtol=1e-4, atol=1e-4)


def test_vad_conversion_parity():
    """FunASR FSMN-VAD state dicts convert into models/fsmn_vad.py params
    and reproduce the numpy forward, offline and in cached streaming steps
    (the [1,128,19,1] ONNX cache contract, fsmn-vad.cpp:72-135)."""
    from asr2pass_tpu.config import VadConfig
    from asr2pass_tpu.models import fsmn_vad
    from asr2pass_tpu.tools.convert_funasr import convert_vad_state_dict

    from funasr_numpy_ref import make_vad_state_dict, vad_forward

    rng = np.random.default_rng(4)
    lorder, layers, proj = 8, 2, 12
    sd = make_vad_state_dict(rng, lorder=lorder, layers=layers,
                             proj_dim=proj)
    feats = rng.standard_normal((30, 40)).astype(np.float32)
    ref = vad_forward(sd, feats)

    params = convert_vad_state_dict(sd)
    cfg = VadConfig(input_dim=40, proj_dim=proj, fsmn_layers=layers,
                    lorder=lorder, hidden_dim=25, output_dim=10,
                    cache_frames=lorder - 1)
    caches = fsmn_vad.init_caches(cfg, 1)
    probs, _ = fsmn_vad.apply(params, jnp.asarray(feats[None]), caches)
    np.testing.assert_allclose(np.asarray(probs[0]), ref,
                               rtol=1e-5, atol=1e-6)
    # streaming chunk steps == offline
    caches = fsmn_vad.init_caches(cfg, 1)
    outs = []
    for s in range(0, 30, 10):
        p, caches = fsmn_vad.apply(params,
                                   jnp.asarray(feats[None, s:s + 10]),
                                   caches)
        outs.append(np.asarray(p[0]))
    np.testing.assert_allclose(np.concatenate(outs), ref,
                               rtol=1e-5, atol=1e-6)


def test_punc_conversion_parity():
    """FunASR CTTransformer state dicts convert into models/ct_transformer
    params and reproduce the numpy forward (the punc ONNX contract,
    ct-transformer.cpp:162-204)."""
    from asr2pass_tpu.config import PuncConfig
    from asr2pass_tpu.models import ct_transformer
    from asr2pass_tpu.tools.convert_funasr import convert_punc_state_dict

    from funasr_numpy_ref import make_punc_state_dict, punc_forward

    rng = np.random.default_rng(5)
    vocab, d, blocks, ffn = 50, 16, 3, 40
    sd = make_punc_state_dict(rng, vocab=vocab, d_model=d, blocks=blocks,
                              ffn_dim=ffn, kernel=ENC_K)
    ids = rng.integers(1, vocab, 15)
    ref = punc_forward(sd, ids, d, blocks, HEADS, ENC_K)

    params = convert_punc_state_dict(sd)
    cfg = PuncConfig(vocab_size=vocab, embed_dim=d, att_dim=d,
                     num_blocks=blocks, attention_heads=HEADS,
                     linear_units=ffn, kernel_size=ENC_K)
    got = ct_transformer.apply(params, cfg, jnp.asarray(ids[None]),
                               jnp.asarray([len(ids)], jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[0]).argmax(-1),
                                  ref.argmax(-1))


def test_sensevoice_conversion_parity():
    """FunASR SenseVoiceSmall state dicts (incl. tp_encoders) convert and
    reproduce the numpy forward (sensevoice-small.cpp:596-642 contract)."""
    from asr2pass_tpu.config import EncoderConfig, SenseVoiceConfig
    from asr2pass_tpu.models import sensevoice
    from asr2pass_tpu.tools.convert_funasr import (
        convert_sensevoice_state_dict,
    )

    from funasr_numpy_ref import make_sensevoice_state_dict, \
        sensevoice_forward

    rng = np.random.default_rng(6)
    vocab, blocks, tp_blocks = 30, 3, 2
    sd = make_sensevoice_state_dict(rng, d_in=D_IN, d_model=D,
                                    blocks=blocks, tp_blocks=tp_blocks,
                                    ffn_dim=FFN, vocab=vocab,
                                    kernel=ENC_K)
    feats = rng.standard_normal((12, D_IN)).astype(np.float32)
    lid, tn = 3, 15
    ref = sensevoice_forward(sd, feats, lid, tn, D, blocks, tp_blocks,
                             HEADS, ENC_K)

    params = convert_sensevoice_state_dict(sd)
    cfg = SenseVoiceConfig(
        encoder=EncoderConfig(input_size=D_IN, output_size=D,
                              num_blocks=blocks, attention_heads=HEADS,
                              linear_units=FFN, kernel_size=ENC_K),
        vocab_size=vocab)
    out = sensevoice.apply(params, cfg, jnp.asarray(feats[None]),
                           jnp.asarray([12], jnp.int32),
                           jnp.asarray([lid]), jnp.asarray([tn]))
    np.testing.assert_allclose(np.asarray(out.logits[0]), ref,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.logits[0]).argmax(-1),
                                  ref.argmax(-1))


def test_hotword_compiler_conversion():
    """bias_encoder LSTM params convert into our hotword-compiler layout
    and reproduce the torch LSTM recurrence (model_eb role)."""
    from asr2pass_tpu.models.layers import lstm_apply

    from funasr_numpy_ref import _lstm_np

    rng = np.random.default_rng(3)
    sd = make_state_dict(rng, d_in=D_IN, d_model=D, enc_blocks=ENC_L,
                         dec_blocks=DEC_L, ffn_dim=FFN, vocab=VOCAB,
                         enc_kernel=ENC_K, dec_kernel=DEC_K, hotword=True)
    params = convert_state_dict(sd)
    assert "hotword_compiler" in params
    ids = rng.integers(0, VOCAB, 7)
    emb = np.asarray(sd["bias_embed.weight"])[ids]
    ref = _lstm_np(sd, "bias_encoder", emb)
    got = np.asarray(lstm_apply(params["hotword_compiler"]["lstm"],
                                jnp.asarray(emb[None])))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_converted_hotword_compiler_serves_without_null_row():
    """A converted contextual checkpoint has no learned null row; the
    compiler derives it the reference way (run the LSTM on a single
    <s>-token entry, paraformer.cpp:645-649) and a ServerModels built
    from such params compiles per-connection hotword embeddings (with
    seg_dict BPE pieces for latin words)."""
    import jax

    from asr2pass_tpu.config import HotwordConfig
    from asr2pass_tpu.models import hotword as hw_mod
    from asr2pass_tpu.text.vocab import make_test_vocab

    cfg = HotwordConfig(vocab_size=64, embed_dim=16, hidden_dim=16)
    full = hw_mod.init(jax.random.PRNGKey(0), cfg)
    converted = {"embed": full["embed"], "lstm": full["lstm"]}  # no null
    vocab = make_test_vocab(64)
    words = [vocab.id2token(10) + vocab.id2token(11), "hello"]
    seg = hw_mod.SegDict()
    seg.map["hello"] = [vocab.id2token(12), vocab.id2token(13)]
    emb = hw_mod.compile_hotwords(converted, cfg, words, vocab,
                                  seg_dict=seg)
    assert emb.shape == (3, 16)
    # the derived null equals the LSTM's response to the <s>-only entry
    import numpy as np

    from asr2pass_tpu.models.layers import embedding, lstm_apply

    blank = np.zeros((1, cfg.max_hotword_len), np.int32)
    blank[0, 0] = 1
    want = np.asarray(lstm_apply(
        full["lstm"], embedding(full["embed"], blank))[0, 0])
    np.testing.assert_allclose(emb[0], want, atol=1e-6)
    # seg_dict changed the latin tokenization: different row than the
    # whole-token fallback
    emb2 = hw_mod.compile_hotwords(converted, cfg, words, vocab)
    assert not np.allclose(emb[2], emb2[2])
