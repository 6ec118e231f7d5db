#!/usr/bin/env python3
"""Stage timing of the REAL serving forward (encoder / CIF / decoder) at
a given batch, using the production code paths (scan + Pallas kernel on
TPU — one kernel call site, cheap to compile through the tunnel).

Run: python scripts/profile_stages.py [--batch 16] [--t 1000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu.config import paraformer_large
from asr2pass_tpu.models import cif, paraformer, sanm_encoder
from asr2pass_tpu.models.layers import length_mask
from asr2pass_tpu.utils import cast_floats


def timeit(fn, *args, iters=8):
    # each profiled fn returns a SCALAR (fp32 sum) so the host sync
    # transfers 4 bytes, not the whole activation, through the tunnel
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = paraformer_large()
    b, t = args.batch, args.t
    max_tokens = t // 2 + 8
    dev_init = jax.jit(
        lambda k: cast_floats(paraformer.init(k, cfg), jnp.bfloat16))
    params = dev_init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (b, t, cfg.frontend.lfr_dim)).astype(np.float32), dtype=jnp.bfloat16)
    lengths = jnp.full((b,), t, jnp.int32)

    @jax.jit
    def enc_only(params, feats, lengths):
        mask = length_mask(lengths, feats.shape[1])
        enc = sanm_encoder.apply(params["encoder"], feats, mask,
                                 d_model=cfg.encoder.output_size,
                                 heads=cfg.encoder.attention_heads)
        return jnp.sum(enc.astype(jnp.float32))

    @jax.jit
    def enc_cif(params, feats, lengths):
        mask = length_mask(lengths, feats.shape[1])
        enc = sanm_encoder.apply(params["encoder"], feats, mask,
                                 d_model=cfg.encoder.output_size,
                                 heads=cfg.encoder.attention_heads)
        alphas = cif.alphas_head(params["predictor"], enc, cfg.predictor,
                                 mask)
        ac, token_num, _ = cif.fire_offline(
            enc, alphas, cfg.predictor.threshold,
            cfg.predictor.tail_threshold,
            max_tokens=max_tokens, lengths=lengths)
        return jnp.sum(ac.astype(jnp.float32)) + jnp.sum(token_num)

    @jax.jit
    def full(params, feats, lengths):
        out = paraformer.apply(params, cfg, feats, lengths,
                               max_tokens=max_tokens)
        ids, n = paraformer.greedy_ids(out)
        return jnp.sum(ids) + jnp.sum(n)

    ms_enc = timeit(enc_only, params, feats, lengths, iters=args.iters)
    ms_cif = timeit(enc_cif, params, feats, lengths, iters=args.iters)
    ms_full = timeit(full, params, feats, lengths, iters=args.iters)
    print(f"b={b} t={t}")
    print(f"encoder          {ms_enc:8.2f} ms")
    print(f"+cif             {ms_cif:8.2f} ms  (cif ~ {ms_cif-ms_enc:.2f})")
    print(f"full (+dec+argmax){ms_full:7.2f} ms  "
          f"(dec+argmax ~ {ms_full-ms_cif:.2f})")
    audio_s = b * t * 0.06
    print(f"throughput @full: {audio_s / (ms_full/1e3):.0f} audio-s/s")


if __name__ == "__main__":
    main()
