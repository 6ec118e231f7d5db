"""FunASR-faithful Paraformer forward in pure numpy, for converter parity.

This is an independent re-implementation of the published FunASR Paraformer
architecture (SAN-M encoder, CIF predictor V2/V3, SAN-M parallel decoder
with the decoders3 ffn tail) operating directly on a torch-layout state
dict — the exact graph the reference serves as `model.onnx`
(/root/reference/onnxruntime/src/paraformer.cpp:463-589 drives it with
inputs [feats, feats_len(, hotword_emb)] and reads [logits, token_lens
(, us_alphas, us_cif_peak)]).

tests/test_convert_parity.py feeds a synthetic torch-layout state dict
through BOTH this forward and tools/convert_funasr.convert_state_dict ->
models/paraformer.apply, and asserts logit equality — proving converted
real checkpoints are numerically faithful without needing the weights in
this environment.

Everything here is batch=1, float64-free, plain numpy. Shapes use torch
conventions (Linear weight [out, in], depthwise Conv1d [d, 1, k], full
Conv1d [out, in, k], ConvTranspose1d [in, out, k]).
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

LN_EPS = 1e-5  # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _ln(x, g, b):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + LN_EPS) * g + b


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _linear(sd, pfx, x):
    y = x @ np.asarray(sd[f"{pfx}.weight"]).T
    if f"{pfx}.bias" in sd:
        y = y + np.asarray(sd[f"{pfx}.bias"])
    return y


def _depthwise(x, taps, left, right):
    """x [T, D], taps [k, D] (= torch depthwise weight [D,1,k] transposed)."""
    t = x.shape[0]
    pad = np.pad(x, ((left, right), (0, 0)))
    out = np.zeros_like(x)
    for k in range(taps.shape[0]):
        out += pad[k: k + t] * taps[k]
    return out


def _heads_attn(q, k, v, heads):
    """q [T,D], k/v [S,D] -> [T,D]; q pre-scaled by d_k^-0.5 by caller."""
    t, d = q.shape
    s = k.shape[0]
    dk = d // heads
    qh = q.reshape(t, heads, dk).transpose(1, 0, 2)
    kh = k.reshape(s, heads, dk).transpose(1, 0, 2)
    vh = v.reshape(s, heads, dk).transpose(1, 0, 2)
    att = _softmax(qh @ kh.transpose(0, 2, 1))
    ctx = att @ vh
    return ctx.transpose(1, 0, 2).reshape(t, d)


def posenc(t: int, depth: int, start: int = 0) -> np.ndarray:
    """FunASR SinusoidalPositionEncoder: 1-based positions, [sin | cos]."""
    log_inc = math.log(10000.0) / (depth // 2 - 1)
    inv = np.exp(np.arange(depth // 2) * -log_inc)
    pos = np.arange(start + 1, start + t + 1, dtype=np.float64)
    scaled = pos[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder (SANMEncoder: encoders0 + encoders + after_norm)
# ---------------------------------------------------------------------------

def _sanm_self_attn(sd, pfx, x, heads, kernel, shift=0):
    qkv = _linear(sd, f"{pfx}.self_attn.linear_q_k_v", x)
    d = qkv.shape[-1] // 3
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    taps = np.asarray(sd[f"{pfx}.self_attn.fsmn_block.weight"])[:, 0, :].T
    left = (kernel - 1) // 2 + shift
    mem = v + _depthwise(v, taps, left, kernel - 1 - left)
    dk = d // heads
    ctx = _heads_attn(q * dk ** -0.5, k, v, heads)
    return _linear(sd, f"{pfx}.self_attn.linear_out", ctx) + mem


def _ffn(sd, pfx, x):
    h = np.maximum(_linear(sd, f"{pfx}.feed_forward.w_1", x), 0.0)
    return _linear(sd, f"{pfx}.feed_forward.w_2", h)


def encoder_forward(sd, feats, d_model, n_blocks, heads, kernel, shift=0):
    """feats [T, d_in] -> [T, d_model]. EncoderLayerSANM semantics: the
    first layer (encoders0, in!=out) drops the attention residual."""
    x = feats * math.sqrt(d_model)
    x = x + posenc(x.shape[0], x.shape[1])
    prefixes = ["encoder.encoders0.0"] + [
        f"encoder.encoders.{i}" for i in range(n_blocks - 1)]
    for pfx in prefixes:
        h = _sanm_self_attn(
            sd, pfx,
            _ln(x, sd[f"{pfx}.norm1.weight"], sd[f"{pfx}.norm1.bias"]),
            heads, kernel, shift)
        x = x + h if x.shape[-1] == h.shape[-1] else h
        x = x + _ffn(sd, pfx,
                     _ln(x, sd[f"{pfx}.norm2.weight"],
                         sd[f"{pfx}.norm2.bias"]))
    return _ln(x, sd["encoder.after_norm.weight"],
               sd["encoder.after_norm.bias"])


# ---------------------------------------------------------------------------
# predictor (CifPredictorV2/V3)
# ---------------------------------------------------------------------------

def _cif_conv(sd, x, l_order, r_order):
    w = np.asarray(sd["predictor.cif_conv1d.weight"])  # [out, in, k]
    b = np.asarray(sd["predictor.cif_conv1d.bias"])
    t = x.shape[0]
    pad = np.pad(x, ((l_order, r_order), (0, 0)))
    out = np.zeros((t, w.shape[0]), x.dtype)
    for k in range(w.shape[2]):
        out += pad[k: k + t] @ w[:, :, k].T
    return out + b


def predictor_alphas(sd, enc, l_order=1, r_order=1,
                     smooth=1.0, noise=0.0):
    h = np.maximum(_cif_conv(sd, enc, l_order, r_order) + enc, 0.0)
    a = 1.0 / (1.0 + np.exp(-_linear(sd, "predictor.cif_output", h)))
    return np.maximum(a[:, 0] * smooth - noise, 0.0)


def cif_fire(hidden, alphas, threshold=1.0, tail=0.45):
    """FunASR cif() + tail_process_fn at batch=1: append a zeros hidden row
    with alpha=tail, integrate-and-fire, return fired frames."""
    hidden = np.concatenate([hidden, np.zeros((1, hidden.shape[1]),
                                              hidden.dtype)])
    alphas = np.concatenate([alphas, np.asarray([tail], alphas.dtype)])
    integrate = 0.0
    frame = np.zeros(hidden.shape[1], hidden.dtype)
    frames = []
    for t in range(hidden.shape[0]):
        a = float(alphas[t])
        completion = threshold - integrate
        integrate += a
        if integrate >= threshold:
            frames.append(frame + completion * hidden[t])
            integrate -= threshold
            frame = integrate * hidden[t]
        else:
            frame = frame + a * hidden[t]
    if not frames:
        return np.zeros((0, hidden.shape[1]), hidden.dtype)
    return np.stack(frames)


def cif_wo_hidden(alphas, threshold):
    """FunASR cif_wo_hidden: pre-reset integrate trace (us_cif_peak)."""
    integrate = 0.0
    trace = np.zeros_like(alphas)
    for t in range(alphas.shape[0]):
        integrate += float(alphas[t])
        trace[t] = integrate
        if integrate >= threshold:
            integrate -= threshold
    return trace


def _lstm_np(sd, pfx, xs, suffix=""):
    """torch nn.LSTM single direction over xs [T, D] -> [T, H]."""
    wi = np.asarray(sd[f"{pfx}.weight_ih_l0{suffix}"])
    wh = np.asarray(sd[f"{pfx}.weight_hh_l0{suffix}"])
    bias = (np.asarray(sd[f"{pfx}.bias_ih_l0{suffix}"])
            + np.asarray(sd[f"{pfx}.bias_hh_l0{suffix}"]))
    hdim = wh.shape[1]
    h = np.zeros(hdim, np.float32)
    c = np.zeros(hdim, np.float32)
    out = []
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    for x in xs:
        g = x @ wi.T + h @ wh.T + bias
        i, f, gg, o = np.split(g, 4)
        c = sig(f) * c + sig(i) * np.tanh(gg)
        h = sig(o) * np.tanh(c)
        out.append(h)
    return np.stack(out)


def predictor_timestamp(sd, enc, token_num, l_order=1, r_order=1,
                        upsample=3, smooth2=0.25, noise2=0.01,
                        threshold=1.0):
    """CifPredictorV3.get_upsample_timestmap: shared cif conv (relu, NO
    residual) -> ConvTranspose1d x3 -> BLSTM -> linear -> sigmoid ->
    relu(a*smooth2 - noise2) -> rescale to token_num -> integrate trace."""
    h = np.maximum(_cif_conv(sd, enc, l_order, r_order), 0.0)
    w = np.asarray(sd["predictor.upsample_cnn.weight"])   # [in, out, k]
    b = np.asarray(sd["predictor.upsample_cnn.bias"])
    t, d = h.shape
    y = np.zeros((t * upsample, w.shape[1]), np.float32)
    for k in range(upsample):
        y[k::upsample] = h @ w[:, :, k] + b
    fw = _lstm_np(sd, "predictor.blstm", y)
    bw = _lstm_np(sd, "predictor.blstm", y[::-1], "_reverse")[::-1]
    y = np.concatenate([fw, bw], axis=-1)
    a = 1.0 / (1.0 + np.exp(-_linear(sd, "predictor.cif_output2", y)))
    a = np.maximum(a[:, 0] * smooth2 - noise2, 0.0)
    a = a * (token_num / max(a.sum(), 1e-6))
    return a, cif_wo_hidden(a, threshold - 1e-4)


# ---------------------------------------------------------------------------
# decoder (ParaformerSANMDecoder: DecoderLayerSANM blocks + decoders3)
# ---------------------------------------------------------------------------

def decoder_forward(sd, ac_embeds, enc, n_blocks, heads, kernel, shift=0):
    """DecoderLayerSANM: ffn first under norm1, fsmn under norm2, ONE
    residual from the block input, then cross-attention under norm3;
    decoders3 = ffn(norm1(x)) with no residual; after_norm; output."""
    x = ac_embeds
    for i in range(n_blocks):
        pfx = f"decoder.decoders.{i}"
        residual = x
        h = _ffn(sd, pfx, _ln(x, sd[f"{pfx}.norm1.weight"],
                              sd[f"{pfx}.norm1.bias"]))
        h = _ln(h, sd[f"{pfx}.norm2.weight"], sd[f"{pfx}.norm2.bias"])
        taps = np.asarray(sd[f"{pfx}.self_attn.fsmn_block.weight"])[:, 0, :].T
        left = (kernel - 1) // 2 + shift
        x = residual + h + _depthwise(h, taps, left, kernel - 1 - left)
        xq = _ln(x, sd[f"{pfx}.norm3.weight"], sd[f"{pfx}.norm3.bias"])
        q = _linear(sd, f"{pfx}.src_attn.linear_q", xq)
        kv = _linear(sd, f"{pfx}.src_attn.linear_k_v", enc)
        d = q.shape[-1]
        k, v = kv[:, :d], kv[:, d:]
        dk = d // heads
        ctx = _heads_attn(q * dk ** -0.5, k, v, heads)
        x = x + _linear(sd, f"{pfx}.src_attn.linear_out", ctx)
    pfx = "decoder.decoders3.0"
    x = _ffn(sd, pfx, _ln(x, sd[f"{pfx}.norm1.weight"],
                          sd[f"{pfx}.norm1.bias"]))
    x = _ln(x, sd["decoder.after_norm.weight"], sd["decoder.after_norm.bias"])
    return _linear(sd, "decoder.output_layer", x)


# ---------------------------------------------------------------------------
# full model + synthetic state dict factory
# ---------------------------------------------------------------------------

def paraformer_forward(sd, feats, *, d_model, enc_blocks, dec_blocks,
                       heads, enc_kernel=11, dec_kernel=11, dec_shift=0,
                       threshold=1.0, tail=0.45, timestamp=False):
    """[T, d_in] LFR+CMVN feats -> (logits [U, V], token_num, us_alphas,
    us_peaks) — the 2/4-output ONNX contract (paraformer.cpp:541-589)."""
    enc = encoder_forward(sd, feats, d_model, enc_blocks, heads, enc_kernel)
    alphas = predictor_alphas(sd, enc)
    ac = cif_fire(enc, alphas, threshold, tail)
    logits = decoder_forward(sd, ac, enc, dec_blocks, heads, dec_kernel,
                             dec_shift)
    us_alphas = us_peaks = None
    if timestamp:
        us_alphas, us_peaks = predictor_timestamp(sd, enc, float(ac.shape[0]),
                                                  threshold=threshold)
    return logits, ac.shape[0], us_alphas, us_peaks


# ---------------------------------------------------------------------------
# CT-Transformer punctuation (FunASR CTTransformer)
# ---------------------------------------------------------------------------

def punc_forward(sd, ids, d_model, n_blocks, heads, kernel):
    """ids [T] -> [T, n_classes]. embed -> SANMEncoder -> linear decoder
    (the punc ONNX contract, ct-transformer.cpp:162-204)."""
    x = np.asarray(sd["embed.weight"])[ids]
    h = encoder_forward(sd, x, d_model, n_blocks, heads, kernel)
    return _linear(sd, "decoder", h)


# ---------------------------------------------------------------------------
# SenseVoice-Small (FunASR SenseVoiceSmall)
# ---------------------------------------------------------------------------

def sensevoice_forward(sd, feats, lid, tn, d_model, blocks, tp_blocks,
                       heads, kernel):
    """feats [T, d_in] + meta ids -> CTC logits [4+T, V]. Query order
    [language, event(1), emo(2), textnorm | frames]; main encoder then
    tp_encoders + tp_norm feed ctc_lo (sensevoice-small.cpp:596-642)."""
    emb = np.asarray(sd["embed.weight"])
    x = np.concatenate([emb[[lid]], emb[[1]], emb[[2]], emb[[tn]], feats], 0)
    h = encoder_forward(sd, x, d_model, blocks, heads, kernel)
    for i in range(tp_blocks):
        pfx = f"encoder.tp_encoders.{i}"
        a = _sanm_self_attn(
            sd, pfx, _ln(h, sd[f"{pfx}.norm1.weight"],
                         sd[f"{pfx}.norm1.bias"]), heads, kernel)
        h = h + a
        h = h + _ffn(sd, pfx, _ln(h, sd[f"{pfx}.norm2.weight"],
                                  sd[f"{pfx}.norm2.bias"]))
    h = _ln(h, sd["encoder.tp_norm.weight"], sd["encoder.tp_norm.bias"])
    return _linear(sd, "ctc.ctc_lo", h)


def make_sensevoice_state_dict(rng, *, d_in, d_model, blocks, tp_blocks,
                               ffn_dim, vocab, n_meta=16, kernel=11):
    b = _SdBuilder(rng)
    b.sd["embed.weight"] = b.w(n_meta, d_in)
    b.add_encoder(d_in, d_model, blocks, ffn_dim, kernel)
    for i in range(tp_blocks):
        b.add_enc_layer(f"encoder.tp_encoders.{i}", d_model, d_model,
                        ffn_dim, kernel)
    b.add_ln("encoder.tp_norm", d_model)
    b.add_linear("ctc.ctc_lo", vocab, d_model)
    return b.sd


# ---------------------------------------------------------------------------
# FSMN-VAD (FunASR FsmnVadStreaming encoder = FSMN)
# ---------------------------------------------------------------------------

def vad_forward(sd, feats):
    """feats [T, input_dim] -> posteriors [T, output_dim]. FunASR FSMN
    forward: in_linear1 -> in_linear2 -> relu -> N x (LinearTransform ->
    Fsmn(causal depthwise conv, inner residual) -> AffineTransform -> relu,
    plain Sequential, no outer residual) -> out_linear1 -> out_linear2 ->
    softmax. The ONNX the reference drives at fsmn-vad.cpp:72-135."""
    x = _linear(sd, "encoder.in_linear2.linear",
                _linear(sd, "encoder.in_linear1.linear", feats))
    x = np.maximum(x, 0.0)
    n = 0
    while f"encoder.fsmn.{n}.0.linear.weight" in sd:
        p = x @ np.asarray(sd[f"encoder.fsmn.{n}.0.linear.weight"]).T
        taps = np.asarray(
            sd[f"encoder.fsmn.{n}.1.conv_left.weight"])[:, 0, :, 0].T
        lorder = taps.shape[0]
        mem = p + _depthwise(p, taps, lorder - 1, 0)
        x = np.maximum(_linear(sd, f"encoder.fsmn.{n}.2.linear", mem), 0.0)
        n += 1
    x = _linear(sd, "encoder.out_linear2.linear",
                _linear(sd, "encoder.out_linear1.linear", x))
    return _softmax(x)


def make_vad_state_dict(rng, *, input_dim=40, affine_dim=14, linear_dim=25,
                        proj_dim=12, layers=2, lorder=8, output_dim=10):
    sd = {}

    def add(pfx, dout, din, bias=True):
        sd[f"{pfx}.linear.weight"] = (rng.standard_normal((dout, din))
                                      * 0.4 / math.sqrt(din)
                                      ).astype(np.float32)
        if bias:
            sd[f"{pfx}.linear.bias"] = (0.05 * rng.standard_normal(dout)
                                        ).astype(np.float32)

    add("encoder.in_linear1", affine_dim, input_dim)
    add("encoder.in_linear2", linear_dim, affine_dim)
    for i in range(layers):
        add(f"encoder.fsmn.{i}.0", proj_dim, linear_dim, bias=False)
        sd[f"encoder.fsmn.{i}.1.conv_left.weight"] = (
            rng.standard_normal((proj_dim, 1, lorder, 1))
            * 0.4 / math.sqrt(lorder)).astype(np.float32)
        add(f"encoder.fsmn.{i}.2", linear_dim, proj_dim)
    add("encoder.out_linear1", affine_dim, linear_dim)
    add("encoder.out_linear2", output_dim, affine_dim)
    return sd


class _SdBuilder:
    """Shared helpers for generating random torch-layout state dicts."""

    def __init__(self, rng):
        self.rng = rng
        self.sd: Dict[str, np.ndarray] = {}

    def w(self, *shape, s=0.3):
        return (self.rng.standard_normal(shape) * s / math.sqrt(shape[-1])
                ).astype(np.float32)

    def add_ln(self, pfx, d):
        self.sd[f"{pfx}.weight"] = (1.0 + 0.1 * self.rng.standard_normal(d)
                                    ).astype(np.float32)
        self.sd[f"{pfx}.bias"] = (0.1 * self.rng.standard_normal(d)
                                  ).astype(np.float32)

    def add_linear(self, pfx, dout, din, bias=True):
        self.sd[f"{pfx}.weight"] = self.w(dout, din)
        if bias:
            self.sd[f"{pfx}.bias"] = (0.05 * self.rng.standard_normal(dout)
                                      ).astype(np.float32)

    def add_enc_layer(self, pfx, din, d_model, ffn_dim, kernel):
        self.add_ln(f"{pfx}.norm1", din)
        self.add_linear(f"{pfx}.self_attn.linear_q_k_v", 3 * d_model, din)
        self.sd[f"{pfx}.self_attn.fsmn_block.weight"] = self.w(
            d_model, 1, kernel)
        self.add_linear(f"{pfx}.self_attn.linear_out", d_model, d_model)
        self.add_ln(f"{pfx}.norm2", d_model)
        self.add_linear(f"{pfx}.feed_forward.w_1", ffn_dim, d_model)
        self.add_linear(f"{pfx}.feed_forward.w_2", d_model, ffn_dim)

    def add_encoder(self, d_in, d_model, blocks, ffn_dim, kernel,
                    pfx="encoder"):
        self.add_enc_layer(f"{pfx}.encoders0.0", d_in, d_model, ffn_dim,
                           kernel)
        for i in range(blocks - 1):
            self.add_enc_layer(f"{pfx}.encoders.{i}", d_model, d_model,
                               ffn_dim, kernel)
        self.add_ln(f"{pfx}.after_norm", d_model)


def make_punc_state_dict(rng, *, vocab, d_model, blocks, ffn_dim,
                         n_classes=6, kernel=11) -> Dict[str, np.ndarray]:
    b = _SdBuilder(rng)
    b.sd["embed.weight"] = b.w(vocab, d_model)
    b.add_encoder(d_model, d_model, blocks, ffn_dim, kernel)
    b.add_linear("decoder", n_classes, d_model)
    return b.sd


def make_state_dict(rng, *, d_in, d_model, enc_blocks, dec_blocks, ffn_dim,
                    vocab, enc_kernel=11, dec_kernel=11,
                    timestamp=False, hotword=False) -> Dict[str, np.ndarray]:
    """Random torch-layout FunASR Paraformer state dict (names exactly as
    torch.save would emit them for the FunASR module tree)."""
    b = _SdBuilder(rng)
    sd = b.sd
    w, add_ln, add_linear = b.w, b.add_ln, b.add_linear

    b.add_encoder(d_in, d_model, enc_blocks, ffn_dim, enc_kernel)

    sd["predictor.cif_conv1d.weight"] = w(d_model, d_model, 3)
    sd["predictor.cif_conv1d.bias"] = (0.05 * rng.standard_normal(d_model)
                                       ).astype(np.float32)
    add_linear("predictor.cif_output", 1, d_model)
    if timestamp:
        sd["predictor.upsample_cnn.weight"] = w(d_model, d_model, 3)
        sd["predictor.upsample_cnn.bias"] = (
            0.05 * rng.standard_normal(d_model)).astype(np.float32)
        half = d_model // 2
        for sfx in ("", "_reverse"):
            sd[f"predictor.blstm.weight_ih_l0{sfx}"] = w(4 * half, d_model)
            sd[f"predictor.blstm.weight_hh_l0{sfx}"] = w(4 * half, half)
            sd[f"predictor.blstm.bias_ih_l0{sfx}"] = (
                0.05 * rng.standard_normal(4 * half)).astype(np.float32)
            sd[f"predictor.blstm.bias_hh_l0{sfx}"] = (
                0.05 * rng.standard_normal(4 * half)).astype(np.float32)
        add_linear("predictor.cif_output2", 1, d_model)

    for i in range(dec_blocks):
        pfx = f"decoder.decoders.{i}"
        add_ln(f"{pfx}.norm1", d_model)
        add_linear(f"{pfx}.feed_forward.w_1", ffn_dim, d_model)
        add_linear(f"{pfx}.feed_forward.w_2", d_model, ffn_dim)
        add_ln(f"{pfx}.norm2", d_model)
        sd[f"{pfx}.self_attn.fsmn_block.weight"] = w(d_model, 1, dec_kernel)
        add_ln(f"{pfx}.norm3", d_model)
        add_linear(f"{pfx}.src_attn.linear_q", d_model, d_model)
        add_linear(f"{pfx}.src_attn.linear_k_v", 2 * d_model, d_model)
        add_linear(f"{pfx}.src_attn.linear_out", d_model, d_model)
    add_ln("decoder.decoders3.0.norm1", d_model)
    add_linear("decoder.decoders3.0.feed_forward.w_1", ffn_dim, d_model)
    add_linear("decoder.decoders3.0.feed_forward.w_2", d_model, ffn_dim)
    add_ln("decoder.after_norm", d_model)
    add_linear("decoder.output_layer", vocab, d_model)

    if hotword:
        sd["bias_embed.weight"] = w(vocab, d_model)
        sd["bias_encoder.weight_ih_l0"] = w(4 * d_model, d_model)
        sd["bias_encoder.weight_hh_l0"] = w(4 * d_model, d_model)
        sd["bias_encoder.bias_ih_l0"] = (
            0.05 * rng.standard_normal(4 * d_model)).astype(np.float32)
        sd["bias_encoder.bias_hh_l0"] = (
            0.05 * rng.standard_normal(4 * d_model)).astype(np.float32)
    return sd
