#!/usr/bin/env python3
"""Encoder stage profile on the live backend: where do the milliseconds go?

Times, at the offline bench shape (b, T=1000, d=512, 50 blocks):
  full    — the real SAN-M encoder forward
  noattn  — attention branch replaced by its FSMN memory branch only
  nofsmn  — FSMN memory branch removed (pure MHA + FFN)
  gemm    — the bare GEMM chain (qkv/out/ffn matmuls, no attention/norm)

full-noattn ~ attention cost; full-nofsmn ~ FSMN cost; gemm = MXU floor.
Run: python scripts/profile_encoder.py [--batch 16] [--fp32]
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
from asr2pass_tpu.models import paraformer, sanm_encoder
from asr2pass_tpu.models.layers import (dense, ffn, fsmn_apply, layer_norm,
                                        length_mask, sanm_attention)
from asr2pass_tpu.utils import cast_floats


def timeit(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def variant_block(layer, x, mask, heads, mode):
    if mode == "full":
        h = sanm_attention(layer["att"], layer_norm(layer["ln1"], x),
                           heads, mask)
    else:
        xn = layer_norm(layer["ln1"], x)
        qkv = dense(layer["att"]["qkv"], xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if mode == "noattn":
            # memory branch only: fsmn(v) -> out proj
            mem = fsmn_apply(layer["att"]["fsmn"], v, mask)
            h = dense(layer["att"]["out"], q * 0) + mem
        elif mode == "nofsmn":
            import math
            d_k = q.shape[-1] // heads
            from asr2pass_tpu.models.layers import (_merge_heads,
                                                    _split_heads)
            qh, kh, vh = (_split_heads(a, heads) for a in (q, k, v))
            s = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                           preferred_element_type=jnp.float32)
            s = s / math.sqrt(d_k)
            att = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", att, vh)
            h = dense(layer["att"]["out"], _merge_heads(ctx))
        else:  # gemm
            h = dense(layer["att"]["out"], v)
    x = x + h
    x = x + ffn(layer["ffn"], layer_norm(layer["ln2"], x))
    return x


def make_variant(params, cfg, mode):
    @jax.jit
    def run(params, feats, lengths):
        mask = length_mask(lengths, feats.shape[1])
        b, t, d_in = feats.shape
        x = feats
        # project through first layer for the right width, full always
        x = sanm_encoder._block(params["first"], x, mask, 4, residual=False)
        n = jax.tree.leaves(params["rest"])[0].shape[0]
        for i in range(n):
            layer = jax.tree.map(lambda a: a[i], params["rest"])
            x = variant_block(layer, x, mask, 4, mode)
        return layer_norm(params["after_norm"], x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--modes", default="gemm,noattn,nofsmn,full",
                    help="comma list of variants to time")
    args = ap.parse_args()

    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = paraformer_large()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    dev_init = jax.jit(
        lambda k: cast_floats(paraformer.init(k, cfg), dtype))
    params = dev_init(jax.random.PRNGKey(0))["encoder"]
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (args.batch, args.t, cfg.frontend.lfr_dim)).astype(np.float32),
        dtype=dtype)
    lengths = jnp.full((args.batch,), args.t, jnp.int32)

    results = {}
    for mode in args.modes.split(","):
        fn = make_variant(params, cfg, mode)
        ms = timeit(fn, params, feats, lengths, iters=args.iters)
        results[mode] = ms
        print(f"{mode:8s} {ms:8.2f} ms")
    if {"full", "noattn", "nofsmn", "gemm"} <= set(results):
        print(f"attention cost ~ {results['full'] - results['noattn']:.2f} ms")
        print(f"fsmn cost      ~ {results['full'] - results['nofsmn']:.2f} ms")
        print(f"gemm floor       {results['gemm']:.2f} ms")


if __name__ == "__main__":
    main()
