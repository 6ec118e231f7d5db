"""Checkpoint/model-dir roundtrip + FunASR converter mapping tests."""
import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import paraformer_tiny
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.runtime.model_zoo import (
    load_offline_bundle,
    load_params,
    save_offline_bundle,
    save_params,
)
from asr2pass_tpu.text.vocab import make_test_vocab


def test_params_roundtrip(tmp_path):
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "w.npz")
    save_params(p, params)
    loaded = load_params(p)
    ref_leaves = jax.tree.leaves(params)
    got_leaves = jax.tree.leaves(loaded)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bundle_roundtrip_and_inference(tmp_path):
    cfg = paraformer_tiny()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    d = str(tmp_path / "model")
    means = np.zeros(cfg.frontend.lfr_dim, np.float32)
    vars_ = np.ones(cfg.frontend.lfr_dim, np.float32)
    save_offline_bundle(d, params, cfg, vocab.tokens, cmvn=(means, vars_))
    b = load_offline_bundle(d)
    assert b.cfg.encoder.num_blocks == cfg.encoder.num_blocks
    assert len(b.vocab) == cfg.vocab_size
    # loaded params drive the model identically
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 20, cfg.frontend.lfr_dim)).astype(np.float32)
    out1 = paraformer.apply(params, cfg, jnp.asarray(feats),
                            jnp.asarray([20]))
    out2 = paraformer.apply(b.params, b.cfg, jnp.asarray(feats),
                            jnp.asarray([20]))
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), rtol=1e-5)


def _fake_funasr_sd(n_enc=3, n_dec=2, d=16, din=560, ffn=32, vocab=40,
                    kernel=11):
    rng = np.random.default_rng(0)
    sd = {}

    def lin(pfx, i, o):
        sd[f"{pfx}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{pfx}.bias"] = rng.standard_normal(o).astype(np.float32)

    def norm(pfx, d_):
        sd[f"{pfx}.weight"] = np.ones(d_, np.float32)
        sd[f"{pfx}.bias"] = np.zeros(d_, np.float32)

    def enc_layer(pfx, d_in):
        norm(f"{pfx}.norm1", d_in)
        lin(f"{pfx}.self_attn.linear_q_k_v", d_in, 3 * d)
        sd[f"{pfx}.self_attn.fsmn_block.weight"] = \
            rng.standard_normal((d, 1, kernel)).astype(np.float32)
        lin(f"{pfx}.self_attn.linear_out", d, d)
        norm(f"{pfx}.norm2", d)
        lin(f"{pfx}.feed_forward.w_1", d, ffn)
        lin(f"{pfx}.feed_forward.w_2", ffn, d)

    enc_layer("encoder.encoders0.0", din)
    for i in range(n_enc - 1):
        enc_layer(f"encoder.encoders.{i}", d)
    norm("encoder.after_norm", d)
    sd["predictor.cif_conv1d.weight"] = \
        rng.standard_normal((d, d, 3)).astype(np.float32)
    sd["predictor.cif_conv1d.bias"] = np.zeros(d, np.float32)
    lin("predictor.cif_output", d, 1)
    for i in range(n_dec):
        pfx = f"decoder.decoders.{i}"
        norm(f"{pfx}.norm1", d)
        sd[f"{pfx}.self_attn.fsmn_block.weight"] = \
            rng.standard_normal((d, 1, kernel)).astype(np.float32)
        norm(f"{pfx}.norm2", d)
        lin(f"{pfx}.src_attn.linear_q", d, d)
        lin(f"{pfx}.src_attn.linear_k_v", d, 2 * d)
        lin(f"{pfx}.src_attn.linear_out", d, d)
        norm(f"{pfx}.norm3", d)
        lin(f"{pfx}.feed_forward.w_1", d, ffn)
        lin(f"{pfx}.feed_forward.w_2", ffn, d)
    norm("decoder.after_norm", d)
    lin("decoder.output_layer", d, vocab)
    return sd


def test_convert_funasr_state_dict_runs_forward():
    from asr2pass_tpu.config import (
        DecoderConfig,
        EncoderConfig,
        ParaformerConfig,
        PredictorConfig,
    )
    from asr2pass_tpu.tools.convert_funasr import convert_state_dict

    sd = _fake_funasr_sd()
    params = convert_state_dict(sd)
    cfg = ParaformerConfig(
        encoder=EncoderConfig(input_size=560, output_size=16, num_blocks=3,
                              attention_heads=2, linear_units=32),
        decoder=DecoderConfig(num_blocks=2, attention_heads=2,
                              linear_units=32),
        predictor=PredictorConfig(idim=16),
        vocab_size=40,
    )
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 20, 560)).astype(np.float32)
    out = paraformer.apply(params, cfg, jnp.asarray(feats),
                           jnp.asarray([20]))
    assert out.logits.shape[-1] == 40
    assert int(out.token_num[0]) >= 0


def test_svs_bundle_roundtrip(tmp_path):
    """save_svs_bundle/load_svs_bundle preserve config + weights + vocab
    (the --svs-dir server flag loads this layout)."""
    import jax
    import numpy as np

    from asr2pass_tpu.config import sensevoice_tiny
    from asr2pass_tpu.models import sensevoice
    from asr2pass_tpu.runtime.model_zoo import (load_svs_bundle,
                                                save_svs_bundle)
    from asr2pass_tpu.text.vocab import make_test_vocab

    cfg = sensevoice_tiny()
    params = sensevoice.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    d = str(tmp_path / "svs")
    save_svs_bundle(d, params, cfg, vocab.tokens,
                    cmvn=(np.zeros(cfg.frontend.lfr_dim, np.float32),
                          np.ones(cfg.frontend.lfr_dim, np.float32)))
    b = load_svs_bundle(d)
    assert b.cfg.vocab_size == cfg.vocab_size
    assert b.cfg.encoder.num_blocks == cfg.encoder.num_blocks
    assert b.cfg.lid_dict == cfg.lid_dict
    assert b.vocab.tokens == list(vocab.tokens)
    assert b.cmvn[0] is not None
    np.testing.assert_allclose(np.asarray(b.params["ctc"]["w"]),
                               np.asarray(params["ctc"]["w"]), atol=0)
    # the loaded bundle actually decodes
    from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline

    rec = SenseVoiceOffline(b.params, b.cfg, b.vocab, cmvn=b.cmvn)
    text, _ = rec.recognize(
        (np.random.default_rng(0).standard_normal(8000) * 0.1
         ).astype(np.float32))
    assert isinstance(text, str)


def test_load_vad_yaml_reference_keys(tmp_path):
    """The VAD dir's config.yaml drives VadConfig — the keys the
    reference consumes (fsmn-vad.cpp:31-47) plus sil_pdf_ids/NN dims;
    absent keys keep the e2e-vad.h defaults."""
    from asr2pass_tpu.config import load_vad_yaml

    p = tmp_path / "config.yaml"
    p.write_text(
        "frontend_conf:\n"
        "  fs: 16000\n  n_mels: 80\n  frame_length: 25\n"
        "  frame_shift: 10\n  window: hamming\n  lfr_m: 5\n  lfr_n: 1\n"
        "model_conf:\n"
        "  max_end_silence_time: 500\n"
        "  max_single_segment_time: 30000\n"
        "  speech_noise_thres: 0.8\n"
        "  sil_pdf_ids: [0, 1]\n"
        "encoder_conf:\n"
        "  proj_dim: 96\n  lorder: 16\n")
    cfg = load_vad_yaml(str(p))
    assert cfg.max_end_silence_time == 500
    assert cfg.max_single_segment_time == 30000
    assert cfg.speech_noise_thres == 0.8
    assert cfg.sil_pdf_ids == (0, 1)
    assert cfg.proj_dim == 96
    assert cfg.lorder == 16 and cfg.cache_frames == 15
    assert cfg.input_dim == 400
    # defaults survive for unlisted keys
    assert cfg.max_start_silence_time == 3000
    assert cfg.window_size_ms == 200


def test_load_punc_yaml_reference_keys(tmp_path):
    """The punc dir's config.yaml drives PuncConfig dims + punc classes
    (ct-transformer.cpp yaml family); absent keys keep defaults."""
    from asr2pass_tpu.config import load_punc_yaml

    p = tmp_path / "config.yaml"
    p.write_text(
        "encoder_conf:\n"
        "  output_size: 256\n  attention_heads: 8\n"
        "  linear_units: 1024\n  num_blocks: 4\n  sanm_shfit: 5\n"
        "punc_list: ['<unk>', '_', '，', '。', '？', '、']\n"
        "vocab_size: 272727\n")
    cfg = load_punc_yaml(str(p))
    assert cfg.att_dim == 256 and cfg.embed_dim == 256
    assert cfg.attention_heads == 8
    assert cfg.linear_units == 1024
    assert cfg.num_blocks == 4
    assert cfg.sanm_shift == 5
    assert cfg.num_classes == 6
    assert cfg.vocab_size == 272727
