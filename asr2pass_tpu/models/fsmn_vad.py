"""FSMN-VAD scoring network (JAX).

Structure-equivalent to the FSMN the reference drives through ONNX
(onnxruntime/src/fsmn-vad.cpp:72-135: [1,T,400] features in, [1,T,248]
sil/speech pdf posteriors out, with four [1,128,19,1] streaming caches —
one per FSMN block, 19 = lorder-1 frames of left context).

Layout (FunASR FSMN semantics exactly, so converted checkpoints are
numerically faithful): in-affine 400->140->250 (two stacked linears, ONE
ReLU after the second), then `fsmn_layers` sequential blocks of (Linear
250->128 no-bias, depthwise causal memory conv with lorder taps and inner
residual, affine 128->250, ReLU) — no outer residual — then out-affine
250->140->248 (no activation between), softmax. Caches are leading-axis
batched [B, cache_frames, proj_dim] arrays so hundreds of concurrent
streams advance in one jitted step (SURVEY.md §2.5 stream-DP).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from asr2pass_tpu.config import VadConfig
from asr2pass_tpu.models.layers import dense, dense_init


def init(key, cfg: VadConfig):
    ks = jax.random.split(key, 4 + 3 * cfg.fsmn_layers)
    in_affine_dim = 140
    params = {
        "in1": dense_init(ks[0], cfg.input_dim, in_affine_dim),
        "in2": dense_init(ks[1], in_affine_dim, cfg.hidden_dim),
        "out1": dense_init(ks[2], cfg.hidden_dim, in_affine_dim),
        "out2": dense_init(ks[3], in_affine_dim, cfg.output_dim),
        "blocks": [],
    }
    for i in range(cfg.fsmn_layers):
        k1, k2, k3 = ks[4 + 3 * i], ks[5 + 3 * i], ks[6 + 3 * i]
        params["blocks"].append({
            "proj": dense_init(k1, cfg.hidden_dim, cfg.proj_dim, bias=False),
            "taps": jax.random.normal(
                k2, (cfg.lorder, cfg.proj_dim), jnp.float32
            ) * (1.0 / cfg.lorder ** 0.5),
            "affine": dense_init(k3, cfg.proj_dim, cfg.hidden_dim),
        })
    return params


def init_caches(cfg: VadConfig, batch: int) -> List[jnp.ndarray]:
    """Zero caches, one [B, cache_frames, proj] per block (InitCache role,
    fsmn-vad.cpp:258-259)."""
    return [
        jnp.zeros((batch, cfg.cache_frames, cfg.proj_dim), jnp.float32)
        for _ in range(cfg.fsmn_layers)
    ]


def apply(params, feats, caches, valid_len=None
          ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """feats: [B, T, input_dim] LFR(5,1)+CMVN features (right-padded).

    Returns (probs [B, T, output_dim] softmax posteriors, new caches).
    With valid_len [B], caches advance by exactly valid_len frames so
    padded chunk steps keep streaming == offline.
    """
    x = jax.nn.relu(dense(params["in2"], dense(params["in1"], feats)))
    new_caches = []
    t = feats.shape[1]
    for block, cache in zip(params["blocks"], caches):
        p = dense(block["proj"], x)                       # [B, T, proj]
        lorder = block["taps"].shape[0]
        ext = jnp.concatenate([cache, p], axis=1)         # [B, C+T, proj]
        mem = jnp.zeros_like(p)
        for k in range(lorder):
            mem = mem + ext[:, k: k + t, :] * block["taps"][k]
        mem = mem + p                                     # inner residual
        c = cache.shape[1]
        if valid_len is None:
            new_caches.append(ext[:, -c:, :])
        else:
            idx = valid_len[:, None] + jnp.arange(c)[None, :]
            new_caches.append(jnp.take_along_axis(ext, idx[..., None], axis=1))
        x = jax.nn.relu(dense(block["affine"], mem))      # sequential, no
        # outer residual (FunASR _build_repeats is a plain nn.Sequential)
    logits = dense(params["out2"], dense(params["out1"], x))
    return jax.nn.softmax(logits, axis=-1), new_caches
