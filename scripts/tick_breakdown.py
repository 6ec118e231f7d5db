#!/usr/bin/env python3
"""Engine tick stage breakdown at a given capacity, via runtime.metrics.

Feeds synthetic bursty audio to a full StreamEngine and prints the
per-stage p50/p95 of the pipelined tick (vad dispatch / p1 collect /
vad decide / p1 dispatch / pass2 handoff) plus the whole-tick time —
where do the milliseconds of a 600 ms tick budget go?

Run: python scripts/tick_breakdown.py [--streams 128] [--ticks 24]
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
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--ticks", type=int, default=24)
    ap.add_argument("--fused-fetch", action="store_true", default=True)
    ap.add_argument("--no-fused-fetch", dest="fused_fetch",
                    action="store_false")
    ap.add_argument("--vad-async", action="store_true", default=False)
    ap.add_argument("--vad-sync", dest="vad_async",
                    action="store_false")
    ap.add_argument("--upload-overlap", action="store_true")
    ap.add_argument("--decide-async", action="store_true")
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from asr2pass_tpu.config import (VadConfig, paraformer_large,
                                     paraformer_large_online)
    from asr2pass_tpu.models import fsmn_vad, paraformer
    from asr2pass_tpu.runtime.engine import StreamEngine
    from asr2pass_tpu.runtime.metrics import GLOBAL
    from asr2pass_tpu.server.engine import ServerModels
    from asr2pass_tpu.text.vocab import make_test_vocab
    from asr2pass_tpu.utils import cast_floats

    acfg = paraformer_large()
    ocfg = paraformer_large_online()
    init_a = jax.jit(lambda k: cast_floats(paraformer.init(k, acfg),
                                           jnp.bfloat16))
    init_o = jax.jit(lambda k: cast_floats(paraformer.init(k, ocfg),
                                           jnp.bfloat16))
    models = ServerModels(
        asr_params=init_a(jax.random.PRNGKey(0)), asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        online_params=init_o(jax.random.PRNGKey(1)), online_cfg=ocfg,
        vad_params=fsmn_vad.init(jax.random.PRNGKey(2), VadConfig()),
        vad_cfg=VadConfig(),
    )
    s = args.streams
    eng = StreamEngine(models, capacity=s, pass2_async=True,
                       vad_async=args.vad_async,
                       fused_fetch=args.fused_fetch,
                       upload_overlap=args.upload_overlap,
                       decide_async=args.decide_async)
    eng.warmup()
    sids = [eng.open() for _ in range(s)]
    rng = np.random.default_rng(0)
    n_tick = 9600
    tick_ms = []
    for k in range(args.ticks + 4):
        x = rng.standard_normal((s, n_tick)).astype(np.float32) * 0.05
        if k % 8 < 5:
            x *= 6.0
        for j, sid in enumerate(sids):
            eng.feed(sid, x[j])
        if k == 4:          # drop warmup ticks from the stage stats
            GLOBAL.stages.clear()
        t0 = time.perf_counter()
        eng.step()
        if k >= 4:
            tick_ms.append((time.perf_counter() - t0) * 1e3)
        for sid in sids:
            eng.poll(sid)
    eng.shutdown()
    rep = GLOBAL.report()["stages"]
    print(f"capacity={s}  tick p50={np.percentile(tick_ms, 50):.1f} ms  "
          f"p95={np.percentile(tick_ms, 95):.1f} ms  "
          f"(budget 600; sustainable ~"
          f"{s * 600 / np.percentile(tick_ms, 50):.0f} streams)")
    for name in ("tick_vad_dispatch", "tick_p1_collect", "tick_vad_decide",
                 "tick_fused_fetch", "tick_p1_detok",
                 "vd_probs_fetch", "vd_automaton",
                 "tick_p1_dispatch", "tick_pass2_handoff",
                 "tick_upload_join"):
        st = rep.get(name)
        if st:
            print(f"  {name:20s} p50 {st['p50_ms']:7.1f}  "
                  f"p95 {st['p95_ms']:7.1f}  max {st['max_ms']:7.1f} ms")


if __name__ == "__main__":
    main()
