"""Torch FunASR-Paraformer fixture + ONNX export, for converter --verify.

Purpose (VERDICT round 2, item 1): break the self-referential parity loop.
tests/funasr_numpy_ref.py is a numpy oracle written in this repo; so is the
JAX model. This module provides a THIRD, independently-executed artifact:
a torch nn.Module with FunASR's exact module tree (state-dict keys match
`torch.save` of the published FunASR Paraformer), whose forward follows the
published FunASR op order, exported to ONNX **by torch's own exporter**
(graph bytes we did not hand-serialize) and then executed by the generic
graph executor in tools/onnx_reader.OnnxExecutor.

The verification chain exercised in CI is therefore exactly the chain a
migrating user runs on a real checkpoint:

    model dir (model.onnx)  --OnnxExecutor-->  logits      (oracle)
    model dir  --convert_funasr-->  JAX params  --paraformer.apply--> logits

with the oracle side produced by torch autograd ops + torch's ONNX
serializer, not by this repo's numpy. The ONNX I/O contract mirrors the
graph the reference drives: inputs [speech, speech_lengths], outputs
[logits, token_num] (/root/reference/onnxruntime/src/paraformer.cpp:463-589,
2-output layout; the 4-output timestamp layout is :549).

torch.onnx.export here uses the TorchScript tracer with a monkeypatched
`_add_onnxscript_fn` (this image lacks the `onnx` pip package; the patch
skips only the onnxscript-function merge step, which is a no-op for graphs
without custom ops — the model bytes are already fully serialized).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn


class SinusoidalPosEnc(nn.Module):
    """FunASR SinusoidalPositionEncoder: 1-based positions, [sin | cos]."""

    def forward(self, x):
        b, t, d = x.shape
        pos = torch.arange(1, t + 1, dtype=torch.float32).unsqueeze(-1)
        log_inc = math.log(10000.0) / (d // 2 - 1)
        inv = torch.exp(torch.arange(d // 2, dtype=torch.float32) * -log_inc)
        scaled = pos * inv.unsqueeze(0)
        pe = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=-1)
        return x + pe.unsqueeze(0)


class MultiHeadedAttentionSANM(nn.Module):
    """FunASR MultiHeadedAttentionSANM: fused qkv, fsmn memory on v."""

    def __init__(self, n_head, in_feat, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.h = n_head
        self.d_k = n_feat // n_head
        self.linear_q_k_v = nn.Linear(in_feat, 3 * n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size, stride=1,
                                    padding=0, groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        self.pad_fn = nn.ConstantPad1d((left, kernel_size - 1 - left), 0.0)

    def forward_fsmn(self, v):
        x = v.transpose(1, 2)
        x = self.fsmn_block(self.pad_fn(x))
        return x.transpose(1, 2) + v

    def forward(self, x):
        b, t, _ = x.shape
        qkv = self.linear_q_k_v(x)
        q, k, v = torch.split(qkv, qkv.shape[-1] // 3, dim=-1)
        mem = self.forward_fsmn(v)
        qh = q.view(b, t, self.h, self.d_k).transpose(1, 2)
        kh = k.view(b, t, self.h, self.d_k).transpose(1, 2)
        vh = v.view(b, t, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(qh * self.d_k ** -0.5, kh.transpose(-2, -1))
        att = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(att, vh).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(ctx) + mem


class FeedForward(nn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.w_1 = nn.Linear(d, ffn)
        self.w_2 = nn.Linear(ffn, d)

    def forward(self, x):
        return self.w_2(torch.relu(self.w_1(x)))


class EncoderLayerSANM(nn.Module):
    """FunASR EncoderLayerSANM (normalize_before=True); the attention
    residual is dropped when in_size != size (the encoders0 layer)."""

    def __init__(self, in_size, size, heads, ffn, kernel):
        super().__init__()
        self.in_size = in_size
        self.size = size
        self.norm1 = nn.LayerNorm(in_size)
        self.self_attn = MultiHeadedAttentionSANM(heads, in_size, size,
                                                  kernel)
        self.norm2 = nn.LayerNorm(size)
        self.feed_forward = FeedForward(size, ffn)

    def forward(self, x):
        h = self.self_attn(self.norm1(x))
        x = x + h if self.in_size == self.size else h
        return x + self.feed_forward(self.norm2(x))


class SANMEncoder(nn.Module):
    def __init__(self, d_in, d_model, blocks, heads, ffn, kernel):
        super().__init__()
        self.d_model = d_model
        self.embed = SinusoidalPosEnc()
        self.encoders0 = nn.ModuleList(
            [EncoderLayerSANM(d_in, d_model, heads, ffn, kernel)])
        self.encoders = nn.ModuleList(
            [EncoderLayerSANM(d_model, d_model, heads, ffn, kernel)
             for _ in range(blocks - 1)])
        self.after_norm = nn.LayerNorm(d_model)

    def forward(self, feats):
        x = feats * self.d_model ** 0.5
        x = self.embed(x)
        for layer in self.encoders0:
            x = layer(x)
        for layer in self.encoders:
            x = layer(x)
        return self.after_norm(x)


class CifPredictorV2(nn.Module):
    """V2 = alphas + fire; timestamp=True adds the V3 bicif upsample head
    (upsample_cnn -> BLSTM -> cif_output2 -> integrate trace), the
    4-output ONNX layout the reference reads at paraformer.cpp:549."""

    def __init__(self, d_model, l_order=1, r_order=1, threshold=1.0,
                 tail_threshold=0.45, timestamp=False, upsample_times=3,
                 smooth_factor2=0.25, noise_threshold2=0.01):
        super().__init__()
        self.pad = nn.ConstantPad1d((l_order, r_order), 0.0)
        self.cif_conv1d = nn.Conv1d(d_model, d_model,
                                    l_order + r_order + 1)
        self.cif_output = nn.Linear(d_model, 1)
        self.threshold = threshold
        self.tail_threshold = tail_threshold
        self.timestamp = timestamp
        if timestamp:
            self.upsample_times = upsample_times
            self.smooth_factor2 = smooth_factor2
            self.noise_threshold2 = noise_threshold2
            self.upsample_cnn = nn.ConvTranspose1d(
                d_model, d_model, upsample_times, upsample_times)
            self.blstm = nn.LSTM(d_model, d_model // 2, 1,
                                 bias=True, batch_first=True,
                                 bidirectional=True)
            self.cif_output2 = nn.Linear(d_model, 1)

    def get_upsample_timestamp(self, enc, token_num):
        """CifPredictorV3.get_upsample_timestmap semantics: shared cif
        conv (relu, NO residual) -> ConvTranspose x3 -> BLSTM -> linear ->
        sigmoid -> relu(a*smooth2 - noise2) -> rescale to token_num ->
        pre-reset integrate trace."""
        ctx = enc.transpose(1, 2)
        h = torch.relu(self.cif_conv1d(self.pad(ctx)))
        us = self.upsample_cnn(h).transpose(1, 2)
        us, _ = self.blstm(us)
        a = torch.sigmoid(self.cif_output2(us)).squeeze(-1)
        a = torch.relu(a * self.smooth_factor2 - self.noise_threshold2)
        a = a * (token_num.unsqueeze(-1)
                 / torch.clamp(a.sum(-1, keepdim=True), min=1e-6))
        return a, cif_wo_hidden(a, self.threshold - 1e-4)

    def forward(self, enc, mask=None):
        ctx = enc.transpose(1, 2)
        queries = self.cif_conv1d(self.pad(ctx))
        output = torch.relu(queries + ctx).transpose(1, 2)
        alphas = torch.sigmoid(self.cif_output(output)).squeeze(-1)
        if mask is not None:
            alphas = alphas * mask
        # tail_process_fn (mask=None branch): append a zero hidden row with
        # alpha = tail_threshold
        b, _, d = enc.shape
        hidden = torch.cat([enc, torch.zeros(b, 1, d)], dim=1)
        alphas = torch.cat(
            [alphas, torch.full((b, 1), self.tail_threshold)], dim=1)
        token_num = alphas.sum(-1)
        acoustic_embeds, cif_peak = cif(hidden, alphas, self.threshold)
        return acoustic_embeds, token_num, alphas, cif_peak


def cif(hidden, alphas, threshold):
    """FunASR cif(): integrate-and-fire with branch-free torch.where
    updates, fired frames gathered per batch item via nonzero."""
    batch_size, len_time, hidden_size = hidden.shape
    integrate = torch.zeros(batch_size)
    frame = torch.zeros(batch_size, hidden_size)
    list_fires = []
    list_frames = []
    for t in range(len_time):
        alpha = alphas[:, t]
        distribution_completion = torch.ones(batch_size) - integrate
        integrate = integrate + alpha
        list_fires.append(integrate)
        fire_place = integrate >= threshold
        integrate = torch.where(fire_place,
                                integrate - torch.ones(batch_size),
                                integrate)
        cur = torch.where(fire_place, distribution_completion, alpha)
        remainds = alpha - cur
        frame = frame + cur.unsqueeze(-1) * hidden[:, t, :]
        list_frames.append(frame)
        frame = torch.where(fire_place.unsqueeze(-1),
                            remainds.unsqueeze(-1) * hidden[:, t, :],
                            frame)
    fires = torch.stack(list_fires, 1)
    frames = torch.stack(list_frames, 1)
    list_ls = []
    len_labels = torch.round(alphas.sum(-1)).int()
    max_label_len = len_labels.max()
    for b in range(batch_size):
        fire = fires[b, :]
        sel = torch.nonzero(fire >= threshold).squeeze(-1)
        frames_sel = torch.index_select(frames[b, :, :], 0, sel)
        pad_n = torch.clamp(max_label_len - frames_sel.shape[0], min=0)
        pad_l = torch.zeros(pad_n, hidden_size)
        list_ls.append(torch.cat([frames_sel, pad_l], 0)[:max_label_len])
    return torch.stack(list_ls, 0), fires


def cif_wo_hidden(alphas, threshold):
    """FunASR cif_wo_hidden: the pre-reset integrate trace (us_cif_peak)."""
    batch = alphas.shape[0]
    integrate = torch.zeros(batch)
    traces = []
    for t in range(alphas.shape[1]):
        integrate = integrate + alphas[:, t]
        traces.append(integrate)
        integrate = torch.where(integrate >= threshold,
                                integrate - threshold, integrate)
    return torch.stack(traces, 1)


class DecoderLayerSANM(nn.Module):
    """FunASR DecoderLayerSANM: ffn under norm1, fsmn-only self_attn under
    norm2 (one residual from block input), cross-attention under norm3."""

    def __init__(self, d_model, heads, ffn, kernel):
        super().__init__()
        self.h = heads
        self.d_k = d_model // heads
        self.norm1 = nn.LayerNorm(d_model)
        self.feed_forward = FeedForward(d_model, ffn)
        self.norm2 = nn.LayerNorm(d_model)
        self.self_attn = _FsmnDecoderAttn(d_model, kernel)
        self.norm3 = nn.LayerNorm(d_model)
        self.src_attn = _SrcAttn(d_model, heads)

    def forward(self, x, enc):
        residual = x
        h = self.feed_forward(self.norm1(x))
        x = residual + self.self_attn(self.norm2(h))
        return x + self.src_attn(self.norm3(x), enc)


class _FsmnDecoderAttn(nn.Module):
    """MultiHeadedAttentionSANMDecoder: depthwise fsmn + input residual."""

    def __init__(self, d_model, kernel):
        super().__init__()
        self.fsmn_block = nn.Conv1d(d_model, d_model, kernel, stride=1,
                                    padding=0, groups=d_model, bias=False)
        left = (kernel - 1) // 2
        self.pad_fn = nn.ConstantPad1d((left, kernel - 1 - left), 0.0)

    def forward(self, x):
        h = x.transpose(1, 2)
        h = self.fsmn_block(self.pad_fn(h))
        return h.transpose(1, 2) + x


class _SrcAttn(nn.Module):
    """MultiHeadedAttentionCrossAtt: separate q, fused kv over memory."""

    def __init__(self, d_model, heads):
        super().__init__()
        self.h = heads
        self.d_k = d_model // heads
        self.linear_q = nn.Linear(d_model, d_model)
        self.linear_k_v = nn.Linear(d_model, 2 * d_model)
        self.linear_out = nn.Linear(d_model, d_model)

    def forward(self, x, mem):
        b = x.shape[0]
        q = self.linear_q(x)
        kv = self.linear_k_v(mem)
        k, v = torch.split(kv, kv.shape[-1] // 2, dim=-1)
        # -1 time dims keep the traced graph valid for any query length
        # (the online decoder's CIF fire count varies per chunk)
        qh = q.view(b, -1, self.h, self.d_k).transpose(1, 2)
        kh = k.view(b, -1, self.h, self.d_k).transpose(1, 2)
        vh = v.view(b, -1, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(qh * self.d_k ** -0.5, kh.transpose(-2, -1))
        att = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(att, vh).transpose(1, 2)
        ctx = ctx.reshape(b, -1, self.h * self.d_k)
        return self.linear_out(ctx)


class _Decoders3(nn.Module):
    """decoders3 tail: ffn(norm1(x)) with NO residual."""

    def __init__(self, d_model, ffn):
        super().__init__()
        self.norm1 = nn.LayerNorm(d_model)
        self.feed_forward = FeedForward(d_model, ffn)

    def forward(self, x):
        return self.feed_forward(self.norm1(x))


class ParaformerSANMDecoder(nn.Module):
    def __init__(self, d_model, blocks, heads, ffn, kernel, vocab):
        super().__init__()
        self.decoders = nn.ModuleList(
            [DecoderLayerSANM(d_model, heads, ffn, kernel)
             for _ in range(blocks)])
        self.decoders3 = nn.ModuleList([_Decoders3(d_model, ffn)])
        self.after_norm = nn.LayerNorm(d_model)
        self.output_layer = nn.Linear(d_model, vocab)

    def forward(self, x, enc):
        for layer in self.decoders:
            x = layer(x, enc)
        for layer in self.decoders3:
            x = layer(x)
        return self.output_layer(self.after_norm(x))


class TorchParaformer(nn.Module):
    """FunASR Paraformer module tree; state-dict keys match the published
    checkpoints (encoder.encoders0.0..., predictor.cif_conv1d,
    decoder.decoders.N..., decoder.decoders3.0, decoder.output_layer)."""

    def __init__(self, d_in, d_model, enc_blocks, dec_blocks, heads, ffn,
                 vocab, kernel=11, timestamp=False):
        super().__init__()
        self.encoder = SANMEncoder(d_in, d_model, enc_blocks, heads, ffn,
                                   kernel)
        self.predictor = CifPredictorV2(d_model, timestamp=timestamp)
        self.decoder = ParaformerSANMDecoder(d_model, dec_blocks, heads,
                                             ffn, kernel, vocab)
        self.timestamp = timestamp

    def forward(self, speech, speech_lengths):
        enc = self.encoder(speech)
        t = speech.shape[1]
        mask = (torch.arange(t).unsqueeze(0)
                < speech_lengths.unsqueeze(-1)).float()
        acoustic_embeds, token_num, _, _ = self.predictor(enc, mask)
        logits = self.decoder(acoustic_embeds, enc)
        if self.timestamp:
            us_alphas, us_cif_peak = self.predictor.get_upsample_timestamp(
                enc, token_num)
            return logits, token_num, us_alphas, us_cif_peak
        return logits, token_num


class TorchSenseVoice(nn.Module):
    """FunASR SenseVoiceSmall module tree (state-dict keys embed.weight,
    encoder.encoders0.0..., encoder.encoders.N..., encoder.after_norm,
    encoder.tp_encoders.N..., encoder.tp_norm, ctc.ctc_lo) with the
    reference ONNX session I/O: [speech, speech_lengths, language,
    textnorm] -> [ctc_logits] (sensevoice-small.cpp:596-642). The meta
    prefix is [lid | query1 | query2 | tn] rows of the shared embed table
    prepended to the LFR features before the encoder."""

    def __init__(self, d_in, d_model, blocks, tp_blocks, heads, ffn, vocab,
                 n_embed=16, kernel=11):
        super().__init__()
        self.embed = nn.Embedding(n_embed, d_in)
        enc = nn.Module()
        enc.encoders0 = nn.ModuleList(
            [EncoderLayerSANM(d_in, d_model, heads, ffn, kernel)])
        enc.encoders = nn.ModuleList(
            [EncoderLayerSANM(d_model, d_model, heads, ffn, kernel)
             for _ in range(blocks - 1)])
        enc.after_norm = nn.LayerNorm(d_model)
        enc.tp_encoders = nn.ModuleList(
            [EncoderLayerSANM(d_model, d_model, heads, ffn, kernel)
             for _ in range(tp_blocks)])
        enc.tp_norm = nn.LayerNorm(d_model)
        self.encoder = enc
        ctc = nn.Module()
        ctc.ctc_lo = nn.Linear(d_model, vocab)
        self.ctc = ctc
        self.d_model = d_model
        self.pos = SinusoidalPosEnc()

    def forward(self, speech, speech_lengths, language, textnorm):
        b = speech.shape[0]
        lid = self.embed(language).unsqueeze(1)            # [B, 1, D]
        queries = self.embed.weight[1:3].unsqueeze(0).expand(b, -1, -1)
        tn = self.embed(textnorm).unsqueeze(1)
        x = torch.cat([lid, queries, tn, speech], dim=1)
        x = x * self.d_model ** 0.5
        x = self.pos(x)
        for layer in self.encoder.encoders0:
            x = layer(x)
        for layer in self.encoder.encoders:
            x = layer(x)
        x = self.encoder.after_norm(x)
        for layer in self.encoder.tp_encoders:
            x = layer(x)
        x = self.encoder.tp_norm(x)
        return self.ctc.ctc_lo(x)


class MultiHeadedAttentionSANMMasked(nn.Module):
    """MultiHeadedAttentionSANM with an explicit [B, T, T] attention mask
    (the VadMask x sub_masks product of the online punc session)."""

    def __init__(self, n_head, in_feat, n_feat, kernel_size):
        super().__init__()
        self.h = n_head
        self.d_k = n_feat // n_head
        self.linear_q_k_v = nn.Linear(in_feat, 3 * n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size, stride=1,
                                    padding=0, groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2
        self.pad_fn = nn.ConstantPad1d((left, kernel_size - 1 - left), 0.0)

    def forward(self, x, att_mask):
        b, t, _ = x.shape
        qkv = self.linear_q_k_v(x)
        q, k, v = torch.split(qkv, qkv.shape[-1] // 3, dim=-1)
        mem = self.fsmn_block(self.pad_fn(v.transpose(1, 2))
                              ).transpose(1, 2) + v
        qh = q.view(b, t, self.h, self.d_k).transpose(1, 2)
        kh = k.view(b, t, self.h, self.d_k).transpose(1, 2)
        vh = v.view(b, t, self.h, self.d_k).transpose(1, 2)
        scores = torch.matmul(qh * self.d_k ** -0.5, kh.transpose(-2, -1))
        scores = scores.masked_fill(att_mask.unsqueeze(1) == 0, -1e30)
        att = torch.softmax(scores, dim=-1)
        ctx = torch.matmul(att, vh).transpose(1, 2).reshape(b, t, -1)
        return self.linear_out(ctx) + mem


class EncoderLayerSANMMasked(nn.Module):
    """EncoderLayerSANM threading the attention mask; same state-dict
    keys as the unmasked layer."""

    def __init__(self, in_size, size, heads, ffn, kernel):
        super().__init__()
        self.in_size = in_size
        self.size = size
        self.norm1 = nn.LayerNorm(in_size)
        self.self_attn = MultiHeadedAttentionSANMMasked(heads, in_size,
                                                        size, kernel)
        self.norm2 = nn.LayerNorm(size)
        self.feed_forward = FeedForward(size, ffn)

    def forward(self, x, att_mask):
        h = self.self_attn(self.norm1(x), att_mask)
        x = x + h if self.in_size == self.size else h
        return x + self.feed_forward(self.norm2(x))


class TorchCTTransformerVadRealtime(nn.Module):
    """FunASR CT-Transformer VadRealtime (online punc) module tree —
    state-dict keys identical to TorchCTTransformer — with the 4-input
    session I/O the reference drives: [inputs, text_lengths, vad_mask
    [1,1,T,T], sub_masks [1,1,T,T]] -> [logits]
    (ct-transformer-online.cpp:154-223; the host passes the SAME VadMask
    buffer for both mask inputs)."""

    def __init__(self, vocab, d_model, blocks, heads, ffn, n_classes=6,
                 kernel=11):
        super().__init__()
        self.embed = nn.Embedding(vocab, d_model)
        enc = nn.Module()
        enc.encoders0 = nn.ModuleList(
            [EncoderLayerSANMMasked(d_model, d_model, heads, ffn, kernel)])
        enc.encoders = nn.ModuleList(
            [EncoderLayerSANMMasked(d_model, d_model, heads, ffn, kernel)
             for _ in range(blocks - 1)])
        enc.after_norm = nn.LayerNorm(d_model)
        self.encoder = enc
        self.decoder = nn.Linear(d_model, n_classes)
        self.d_model = d_model
        self.pos = SinusoidalPosEnc()

    def forward(self, inputs, text_lengths, vad_mask, sub_masks):
        m = (vad_mask * sub_masks).squeeze(1)              # [B, T, T]
        x = self.embed(inputs) * self.d_model ** 0.5
        x = self.pos(x)
        for layer in self.encoder.encoders0:
            x = layer(x, m)
        for layer in self.encoder.encoders:
            x = layer(x, m)
        return self.decoder(self.encoder.after_norm(x))


class TorchCTTransformer(nn.Module):
    """FunASR CTTransformer punc model: embed -> SANMEncoder -> linear
    'decoder' head (the punc ONNX contract, ct-transformer.cpp:162-204)."""

    def __init__(self, vocab, d_model, blocks, heads, ffn, n_classes=6,
                 kernel=11):
        super().__init__()
        self.embed = nn.Embedding(vocab, d_model)
        self.encoder = SANMEncoder(d_model, d_model, blocks, heads, ffn,
                                   kernel)
        self.decoder = nn.Linear(d_model, n_classes)

    def forward(self, inputs, text_lengths):
        return self.decoder(self.encoder(self.embed(inputs)))


class TorchOnlineEncoder(nn.Module):
    """FunASR streaming-export encoder.onnx contract
    (/root/reference/onnxruntime/src/paraformer-online.cpp:415-462):
    inputs [speech (1, W, lfr_dim) — already sqrt(d)-scaled and
    pos-embedded ON HOST (GetPosEmb, :240-268; scaling :555-559),
    speech_lengths int32] -> outputs [enc, enc_lens, alphas]. Same
    encoder/predictor weights+keys as the offline tree, minus the
    in-graph posenc."""

    def __init__(self, d_in, d_model, blocks, heads, ffn, kernel):
        super().__init__()
        enc = nn.Module()
        enc.encoders0 = nn.ModuleList(
            [EncoderLayerSANM(d_in, d_model, heads, ffn, kernel)])
        enc.encoders = nn.ModuleList(
            [EncoderLayerSANM(d_model, d_model, heads, ffn, kernel)
             for _ in range(blocks - 1)])
        enc.after_norm = nn.LayerNorm(d_model)
        self.encoder = enc
        self.predictor = CifPredictorV2(d_model)

    def forward(self, speech, speech_lengths):
        x = speech
        for layer in self.encoder.encoders0:
            x = layer(x)
        for layer in self.encoder.encoders:
            x = layer(x)
        enc = self.encoder.after_norm(x)
        t = speech.shape[1]
        mask = (torch.arange(t).unsqueeze(0)
                < speech_lengths.unsqueeze(-1)).float()
        ctx = enc.transpose(1, 2)
        queries = self.predictor.cif_conv1d(self.predictor.pad(ctx))
        output = torch.relu(queries + ctx).transpose(1, 2)
        alphas = (torch.sigmoid(self.predictor.cif_output(output))
                  .squeeze(-1) * mask)
        return enc, speech_lengths, alphas


class _FsmnDecoderAttnCached(nn.Module):
    """MultiHeadedAttentionSANMDecoder streaming form: fully-causal
    depthwise conv over [cache | x]; cache [1, D, kernel-1] (the
    reference's fsmn_shape_ {1, fsmn_dims, fsmn_lorder},
    paraformer-online.cpp:374-383)."""

    def __init__(self, d_model, kernel):
        super().__init__()
        self.fsmn_block = nn.Conv1d(d_model, d_model, kernel, stride=1,
                                    padding=0, groups=d_model, bias=False)
        self.kernel = kernel

    def forward(self, x, cache):
        h = x.transpose(1, 2)                          # [1, D, T]
        ext = torch.cat([cache, h], dim=2)             # [1, D, k-1+T]
        out = self.fsmn_block(ext)                     # valid conv -> T
        # negative start keeps the traced Slice valid for any chunk length
        new_cache = ext[:, :, -(self.kernel - 1):]
        return out.transpose(1, 2) + x, new_cache


class DecoderLayerSANMCached(nn.Module):
    """DecoderLayerSANM with the streaming fsmn-cache contract; weights
    and state-dict keys identical to the offline layer."""

    def __init__(self, d_model, heads, ffn, kernel):
        super().__init__()
        self.norm1 = nn.LayerNorm(d_model)
        self.feed_forward = FeedForward(d_model, ffn)
        self.norm2 = nn.LayerNorm(d_model)
        self.self_attn = _FsmnDecoderAttnCached(d_model, kernel)
        self.norm3 = nn.LayerNorm(d_model)
        self.src_attn = _SrcAttn(d_model, heads)

    def forward(self, x, enc, cache):
        residual = x
        h = self.feed_forward(self.norm1(x))
        m, new_cache = self.self_attn(self.norm2(h), cache)
        x = residual + m
        return x + self.src_attn(self.norm3(x), enc), new_cache


class TorchOnlineDecoder(nn.Module):
    """FunASR streaming-export decoder.onnx contract
    (paraformer-online.cpp:474-512): inputs [enc, enc_lens,
    acoustic_embeds, acoustic_embeds_len, in_cache_0..L-1] -> outputs
    [logits, sample_ids, out_cache_0..L-1]. The acoustic-embeds time
    axis is dynamic (the per-chunk CIF fire count varies), so head
    reshapes use -1."""

    def __init__(self, d_model, blocks, heads, ffn, kernel, vocab):
        super().__init__()
        dec = nn.Module()
        dec.decoders = nn.ModuleList(
            [DecoderLayerSANMCached(d_model, heads, ffn, kernel)
             for _ in range(blocks)])
        dec.decoders3 = nn.ModuleList([_Decoders3(d_model, ffn)])
        dec.after_norm = nn.LayerNorm(d_model)
        dec.output_layer = nn.Linear(d_model, vocab)
        self.decoder = dec

    def forward(self, enc, enc_lens, acoustic_embeds, acoustic_embeds_len,
                *caches):
        x = acoustic_embeds
        new_caches = []
        for layer, c in zip(self.decoder.decoders, caches):
            x, nc = layer(x, enc, c)
            new_caches.append(nc)
        for layer in self.decoder.decoders3:
            x = layer(x)
        logits = self.decoder.output_layer(self.decoder.after_norm(x))
        ids = torch.argmax(logits, dim=-1)
        return (logits, ids, *new_caches)


class _VadLinear(nn.Module):
    """FunASR LinearTransform/AffineTransform wrapper (`.linear` inner)."""

    def __init__(self, din, dout, bias=True):
        super().__init__()
        self.linear = nn.Linear(din, dout, bias=bias)

    def forward(self, x):
        return self.linear(x)


class _VadFsmnBlock(nn.Module):
    """FunASR FSMN BasicBlock with the streaming-cache contract: proj
    (no bias) -> causal depthwise conv over [cache | x] with inner
    residual -> affine -> relu. Cache [1, proj, lorder-1, 1] per the
    session the reference drives (fsmn-vad.cpp:95-101, {1,128,19,1})."""

    def __init__(self, hidden, proj, lorder):
        super().__init__()
        self.add_module("0", _VadLinear(hidden, proj, bias=False))
        conv = nn.Module()
        conv.conv_left = nn.Conv2d(proj, proj, (lorder, 1), stride=1,
                                   padding=0, groups=proj, bias=False)
        self.add_module("1", conv)
        self.add_module("2", _VadLinear(proj, hidden))
        self.lorder = lorder

    def forward(self, x, cache):
        p = getattr(self, "0")(x)                      # [1, T, proj]
        h = p.transpose(1, 2).unsqueeze(-1)            # [1, proj, T, 1]
        ext = torch.cat([cache, h], dim=2)             # [1, proj, C+T, 1]
        mem = getattr(self, "1").conv_left(ext) + h    # inner residual
        new_cache = ext[:, :, -(self.lorder - 1):, :]
        out = torch.relu(getattr(self, "2")(
            mem.squeeze(-1).transpose(1, 2)))
        return out, new_cache


class TorchFsmnVad(nn.Module):
    """FunASR FsmnVadStreaming module tree (state-dict keys
    encoder.in_linear1/2, encoder.fsmn.N.{0,1,2}, encoder.out_linear1/2)
    with the reference ONNX session I/O: [speech, in_cache_0..L-1] ->
    [probs, out_cache_0..L-1] (fsmn-vad.cpp:72-135)."""

    def __init__(self, input_dim, affine_dim, linear_dim, proj_dim,
                 layers, lorder, output_dim):
        super().__init__()
        enc = nn.Module()
        enc.in_linear1 = _VadLinear(input_dim, affine_dim)
        enc.in_linear2 = _VadLinear(affine_dim, linear_dim)
        enc.fsmn = nn.ModuleList(
            [_VadFsmnBlock(linear_dim, proj_dim, lorder)
             for _ in range(layers)])
        enc.out_linear1 = _VadLinear(linear_dim, affine_dim)
        enc.out_linear2 = _VadLinear(affine_dim, output_dim)
        self.encoder = enc

    def forward(self, speech, *caches):
        e = self.encoder
        x = torch.relu(e.in_linear2(e.in_linear1(speech)))
        new_caches = []
        for blk, c in zip(e.fsmn, caches):
            x, nc = blk(x, c)
            new_caches.append(nc)
        probs = torch.softmax(e.out_linear2(e.out_linear1(x)), dim=-1)
        return (probs, *new_caches)


def export_onnx(module: nn.Module, example_inputs, path: str,
                input_names, output_names):
    """torch.onnx.export via the TorchScript tracer; the onnxscript merge
    step is skipped (no custom ops; the `onnx` pip package is absent)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.onnx.export(module, example_inputs, path,
                          input_names=input_names,
                          output_names=output_names, dynamo=False,
                          do_constant_folding=True)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def load_numpy_state_dict(module: nn.Module, sd: dict):
    """Load a {name: np.ndarray} torch-layout state dict (e.g. from
    tests/funasr_numpy_ref.make_state_dict)."""
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
               if k in dict(module.named_parameters())
               or k in dict(module.named_buffers())}
    missing = [k for k in dict(module.named_parameters()) if k not in sd]
    if missing:
        raise KeyError(f"state dict missing {missing[:5]}")
    module.load_state_dict(tensors, strict=False)
    return module
