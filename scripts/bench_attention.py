#!/usr/bin/env python3
"""Micro-bench the single-shot attention kernel at encoder serving shapes.

Times 50 chained kernel calls (one encoder depth) via lax.scan at
[b, h, t, d] = [16, 4, 1000, 128] bf16, for the current
ASR2PASS_SS_BLOCK_Q. Sweep: for q in 128 256 512 1024; do
ASR2PASS_SS_BLOCK_Q=$q python scripts/bench_attention.py; done
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--layers", type=int, default=50)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--xla", action="store_true",
                    help="time the unfused XLA path instead")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from asr2pass_tpu.ops import attention as att

    b, h, t, d = args.batch, args.heads, args.t, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    mask = jnp.ones((b, t), jnp.float32)

    def one(x, _):
        if args.xla:
            import math
            s = jnp.einsum("bhtd,bhsd->bhts", x, k,
                           preferred_element_type=jnp.float32)
            s = s / math.sqrt(d)
            s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhts,bhsd->bhtd", p, v)
        else:
            out = att.flash_attention(x, k, v, mask)
        return out, None

    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(one, q, None, length=args.layers)
        return jnp.sum(out.astype(jnp.float32))

    r = run(q)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = run(q)
    np.asarray(r)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    flops = 2 * 2 * b * h * t * t * d * args.layers
    print(f"block_q={os.environ.get('ASR2PASS_SS_BLOCK_Q', '256'):>5s} "
          f"xla={args.xla}  {ms:8.2f} ms for {args.layers} layers "
          f"({flops / (ms / 1e3) / 1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
