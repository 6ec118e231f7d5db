"""SenseVoice-small: multilingual (zh/en/ja/ko/yue) non-autoregressive CTC
model with meta prefix tokens.

Role of sensevoice-small.cpp: the offline forward takes
[feats, len, language-id, textnorm-id] (:596-642) and the decoder strips
the first 4 meta outputs (language, emotion, event, textnorm — CTCSearch
:323-377). Here: 4 learned query embeddings (lid and textnorm selected from
per-option tables, emotion/event fixed queries) are prepended to the
feature-projected sequence, a SAN-M encoder runs over [meta | frames], and
a CTC head produces vocab logits.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import SenseVoiceConfig
from asr2pass_tpu.models import sanm_encoder
from asr2pass_tpu.models.layers import (
    dense,
    dense_init,
    length_mask,
)

NUM_META = 4  # lid, emotion, event, textnorm prefix positions


def init(key, cfg: SenseVoiceConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d_in = cfg.encoder.input_size
    n_lid = max(cfg.lid_dict.values()) + 1
    n_tn = max(cfg.textnorm_dict.values()) + 1
    return {
        "encoder": sanm_encoder.init(k1, cfg.encoder),
        "lid_embed": jax.random.normal(k2, (n_lid, d_in), jnp.float32) * 0.02,
        "tn_embed": jax.random.normal(k3, (n_tn, d_in), jnp.float32) * 0.02,
        "query_embed": jax.random.normal(k4, (2, d_in), jnp.float32) * 0.02,
        "ctc": dense_init(k5, cfg.encoder.output_size, cfg.vocab_size),
    }


class SenseVoiceOutput(NamedTuple):
    logits: jnp.ndarray     # [B, 4+T, V]
    lengths: jnp.ndarray    # [B] valid positions incl. meta


def apply(params, cfg: SenseVoiceConfig, feats, lengths, lid_ids, tn_ids
          ) -> SenseVoiceOutput:
    """feats: [B, T, lfr_dim]; lid_ids/tn_ids: [B] meta token ids.

    Converted SenseVoiceSmall checkpoints carry the tp_encoders stack
    (`tp` params): after the main encoder's after_norm, tp_blocks more
    SAN-M layers + tp_norm feed the CTC head — the FunASR
    SenseVoiceEncoderSmall layout."""
    import jax

    b, t, d_in = feats.shape
    lid = jnp.take(params["lid_embed"], lid_ids, axis=0)[:, None, :]
    tn = jnp.take(params["tn_embed"], tn_ids, axis=0)[:, None, :]
    queries = jnp.broadcast_to(params["query_embed"][None], (b, 2, d_in))
    x = jnp.concatenate([lid, queries, tn, feats], axis=1)
    full_len = lengths + NUM_META
    mask = length_mask(full_len, t + NUM_META)
    enc = sanm_encoder.apply(params["encoder"], x, mask,
                             d_model=cfg.encoder.output_size,
                             heads=cfg.encoder.attention_heads)
    if "tp" in params and params["tp"] is not None:
        from asr2pass_tpu.models.layers import layer_norm

        n = jax.tree.leaves(params["tp"]["rest"])[0].shape[0]
        for i in range(n):
            layer = jax.tree.map(lambda a: a[i], params["tp"]["rest"])
            enc = sanm_encoder._block(layer, enc, mask,
                                      cfg.encoder.attention_heads,
                                      residual=True)
        enc = layer_norm(params["tp"]["norm"], enc)
    logits = dense(params["ctc"], enc)
    return SenseVoiceOutput(logits=logits, lengths=full_len)


@functools.partial(jax.jit, static_argnums=(1,))
def apply_jit(params, cfg: SenseVoiceConfig, feats, lengths, lid_ids, tn_ids):
    return apply(params, cfg, feats, lengths, lid_ids, tn_ids)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def greedy_ids(out: SenseVoiceOutput, blank_id: int = 0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device greedy CTC decode: argmax + repeat-collapse + blank and
    meta-prefix strip, so serving fetches [B, U] int32 ids + [B] counts
    instead of the [B, T, V] logits tensor (at production scale V≈25k
    that tensor is ~820 MB/chunk over a ~30 MB/s device->host tunnel —
    the round-trip economics rule in CLAUDE.md). Exactly mirrors
    decode/ctc.ctc_greedy(skip_first=NUM_META), the CTCSearch semantics
    of sensevoice-small.cpp:323-377.

    Returns (ids [B, L-NUM_META], counts [B], meta [B, NUM_META]) where
    meta holds the argmax of the lang/emotion/event/textnorm positions.
    """
    logits, lengths = out.logits, out.lengths
    b, l, _ = logits.shape
    am = jnp.argmax(logits, -1).astype(jnp.int32)           # [B, L]
    t_idx = jnp.arange(l)[None, :]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), am[:, :-1]], axis=1)
    # the host greedy starts fresh at skip_first: no dedup vs meta frame
    prev = jnp.where(t_idx == NUM_META, -1, prev)
    keep = ((t_idx >= NUM_META) & (t_idx < lengths[:, None])
            & (am != blank_id) & (am != prev))
    u = l - NUM_META
    # compact kept tokens left; dropped frames scatter into a spare
    # column that the final slice discards
    pos = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, u)
    ids = jnp.zeros((b, u + 1), jnp.int32).at[
        jnp.arange(b)[:, None], pos].set(am)
    counts = keep.sum(1).astype(jnp.int32)
    meta = jnp.argmax(logits[:, :NUM_META], -1).astype(jnp.int32)
    return ids[:, :u], counts, meta
