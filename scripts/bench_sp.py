#!/usr/bin/env python3
"""Sequence-parallel crossover measurement (VERDICT r3 item 8).

Two modes:
  --cpu-mesh   8 virtual CPU devices: times encode_sequence_parallel at
               sp = 1/2/4/8 for several T on a small encoder — the
               RELATIVE speedups expose the halo/all-gather overhead of
               the SP design (absolute CPU times are not TPU times).
  (default)    one real TPU chip: times the flagship single-chip encoder
               forward per T bucket — the long-T cost curve that decides
               when sharding T over idle chips beats a single chip.

Prints one JSON line per measurement; paste into PARITY.md's SP table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-mesh", action="store_true")
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    if args.cpu_mesh:
        from jax.sharding import Mesh

        from asr2pass_tpu.config import EncoderConfig
        from asr2pass_tpu.models import sanm_encoder
        from asr2pass_tpu.models.layers import length_mask
        from asr2pass_tpu.parallel.sequence import encode_sequence_parallel

        cfg = EncoderConfig(input_size=80, output_size=64, num_blocks=2,
                            attention_heads=2, linear_units=128)
        params = sanm_encoder.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        for t in (2048, 4096, 8192):
            feats = rng.standard_normal((1, t, 80)).astype(np.float32)
            base = None
            for n in (1, 2, 4, 8):
                mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
                if n == 1:
                    mask = length_mask(jnp.asarray([t - 5]), t)
                    fn = jax.jit(lambda pr, x: sanm_encoder.apply(
                        pr, x, mask, d_model=cfg.output_size,
                        heads=cfg.attention_heads))
                    out = fn(params, jnp.asarray(feats))
                    np.asarray(out[0, 0, 0])
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = fn(params, jnp.asarray(feats))
                    np.asarray(out[0, 0, 0])
                else:
                    out = encode_sequence_parallel(
                        params, feats, cfg, mesh, axis="sp",
                        lengths=[t - 5])
                    np.asarray(out[0, 0, 0])
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = encode_sequence_parallel(
                            params, feats, cfg, mesh, axis="sp",
                            lengths=[t - 5])
                    np.asarray(out[0, 0, 0])
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                if base is None:
                    base = ms
                print(json.dumps({
                    "mode": "cpu_mesh_sp", "T": t, "sp": n,
                    "ms": round(ms, 1),
                    "speedup_vs_1dev": round(base / ms, 2)}))
    else:
        from asr2pass_tpu.config import paraformer_large
        from asr2pass_tpu.models import paraformer
        from asr2pass_tpu.utils import cast_floats

        cfg = paraformer_large()
        params = jax.jit(lambda k: cast_floats(
            paraformer.init(k, cfg), jnp.bfloat16))(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        for t in (1024, 2048, 4096):
            feats = jnp.asarray(rng.standard_normal(
                (1, t, cfg.frontend.lfr_dim)).astype(np.float32))
            lens = jnp.asarray([t], jnp.int32)

            @jax.jit
            def fwd(pr, x, n):
                out = paraformer.apply(pr, cfg, x, n,
                                       max_tokens=x.shape[1] // 2 + 8)
                return paraformer.greedy_ids(out)

            ids, k = fwd(params, feats, lens)
            np.asarray(k)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ids, k = fwd(params, feats, lens)
            np.asarray(k)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            audio_s = t * 0.06
            print(json.dumps({
                "mode": "tpu_single_chip", "T": t,
                "audio_s": round(audio_s, 1), "ms": round(ms, 1),
                "audio_s_per_s": round(audio_s / (ms / 1e3), 0)}))


if __name__ == "__main__":
    main()
