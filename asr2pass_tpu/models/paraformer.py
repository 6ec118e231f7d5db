"""Offline Paraformer: SAN-M encoder + CIF predictor + parallel decoder.

The TPU-native re-design of the reference's pass-2/offline AM
(onnxruntime/src/paraformer.cpp — there the model is an opaque ONNX session
run at :463-589; here every stage is explicit JAX). One forward =
encoder -> alphas -> integrate-and-fire -> parallel decoder -> logits, all
batched, masked and jitted with static shapes (padding buckets are handled
by the runtime, SURVEY.md §7 "recompilation control").
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import ParaformerConfig
from asr2pass_tpu.models import cif, sanm_decoder, sanm_encoder
from asr2pass_tpu.models.layers import length_mask


class ParaformerOutput(NamedTuple):
    logits: jnp.ndarray        # [B, U, V]
    token_num: jnp.ndarray     # [B]
    enc: jnp.ndarray           # [B, T, D]
    alphas: jnp.ndarray        # [B, T]
    us_alphas: Optional[jnp.ndarray]    # [B, 3T] (timestamp models)
    us_cif_peak: Optional[jnp.ndarray]  # [B, 3T]


def init(key, cfg: ParaformerConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": sanm_encoder.init(k1, cfg.encoder),
        "predictor": cif.init(k2, cfg.predictor),
        "decoder": sanm_decoder.init(
            k3, cfg.decoder, cfg.encoder.output_size, cfg.vocab_size,
            use_hotword=cfg.use_hotword,
        ),
    }


def apply(params, cfg: ParaformerConfig, feats, lengths,
          hw_emb=None, hw_mask=None,
          max_tokens=None) -> ParaformerOutput:
    """feats: [B, T, lfr_dim] LFR+CMVN features, lengths: [B].

    Equivalent of one offline Forward (paraformer.cpp:463-589): returns
    greedy-decodable logits plus CIF metadata; timestamp models also emit
    us_alphas/us_cif_peak (the 4-output ONNX layout, :549).
    """
    mask = length_mask(lengths, feats.shape[1])
    enc = sanm_encoder.apply(params["encoder"], feats, mask,
                             d_model=cfg.encoder.output_size,
                             heads=cfg.encoder.attention_heads)
    alphas = cif.alphas_head(params["predictor"], enc, cfg.predictor, mask)
    ac_embeds, token_num, _ = cif.fire_offline(
        enc, alphas, cfg.predictor.threshold, cfg.predictor.tail_threshold,
        max_tokens=max_tokens, lengths=lengths,
    )
    tok_mask = length_mask(token_num, ac_embeds.shape[1])
    logits = sanm_decoder.apply(
        params["decoder"], ac_embeds, enc, enc_mask=mask, mask=tok_mask,
        hw_emb=hw_emb, hw_mask=hw_mask, cfg=cfg.decoder,
    )
    us_alphas = us_peak = None
    if cfg.predictor.use_timestamp:
        us_alphas = cif.upsampled_alphas(params["predictor"], enc,
                                         cfg.predictor, mask,
                                         token_num=token_num)
        us_peak = cif.peaks_from_alphas(us_alphas,
                                        cfg.predictor.threshold - 1e-4)
    return ParaformerOutput(logits=logits, token_num=token_num, enc=enc,
                            alphas=alphas, us_alphas=us_alphas,
                            us_cif_peak=us_peak)


@functools.partial(jax.jit, static_argnums=(1, 6))
def apply_jit(params, cfg: ParaformerConfig, feats, lengths,
              hw_emb=None, hw_mask=None,
              max_tokens=None) -> ParaformerOutput:
    return apply(params, cfg, feats, lengths, hw_emb, hw_mask, max_tokens)


def apply_sp(params, cfg: ParaformerConfig, feats, lengths, mesh,
             axis: str = "sp", max_tokens=None) -> ParaformerOutput:
    """Sequence-parallel forward for very-long segments (SURVEY §5
    long-context row): the 50-block encoder — the dominant FLOPs — runs
    with the TIME axis sharded over `mesh` (parallel/sequence.py: local q,
    all-gathered k/v, ppermute FSMN halos); the CIF scan + decoder tail
    run under a jit on the sharded encodings, letting GSPMD place the
    gather. T must be padded to a multiple of the axis size (the
    recognizer's SP bucket does this; masks carry the true length)."""
    from asr2pass_tpu.parallel.sequence import encode_sequence_parallel

    enc = encode_sequence_parallel(params["encoder"], feats, cfg.encoder,
                                   mesh, axis=axis, lengths=lengths)

    @functools.partial(jax.jit, static_argnums=(1, 4))
    def tail(params, cfg, enc, lengths, max_tokens):
        mask = length_mask(lengths, enc.shape[1])
        alphas = cif.alphas_head(params["predictor"], enc, cfg.predictor,
                                 mask)
        ac_embeds, token_num, _ = cif.fire_offline(
            enc, alphas, cfg.predictor.threshold,
            cfg.predictor.tail_threshold, max_tokens=max_tokens,
            lengths=lengths)
        tok_mask = length_mask(token_num, ac_embeds.shape[1])
        logits = sanm_decoder.apply(
            params["decoder"], ac_embeds, enc, enc_mask=mask,
            mask=tok_mask, cfg=cfg.decoder)
        us_alphas = us_peak = None
        if cfg.predictor.use_timestamp:
            us_alphas = cif.upsampled_alphas(params["predictor"], enc,
                                             cfg.predictor, mask,
                                             token_num=token_num)
            us_peak = cif.peaks_from_alphas(us_alphas,
                                            cfg.predictor.threshold - 1e-4)
        return logits, token_num, alphas, us_alphas, us_peak

    logits, token_num, alphas, us_alphas, us_peak = tail(
        params, cfg, enc, jnp.asarray(lengths, jnp.int32), max_tokens)
    return ParaformerOutput(logits=logits, token_num=token_num, enc=enc,
                            alphas=alphas, us_alphas=us_alphas,
                            us_cif_peak=us_peak)


def greedy_ids(out: ParaformerOutput):
    """Argmax token ids [B, U] + token counts [B] (GreedySearch role,
    paraformer.cpp:386-408; detokenization lives in text/vocab.py)."""
    return jnp.argmax(out.logits, axis=-1), out.token_num
