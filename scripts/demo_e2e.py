#!/usr/bin/env python3
"""Self-contained end-to-end demo: train -> save -> serve -> transcribe.

Without any downloaded weights, this script:
  1. trains the tiny Paraformer on synthetic tone-audio (our train step)
  2. saves it as a reference-layout model directory (weights.npz)
  3. launches the websocket server on that directory
  4. streams new tone-audio through the 2pass protocol with the client API
  5. prints expected vs transcribed text

Run: python scripts/demo_e2e.py   (CPU-only, ~2 minutes)
"""
from __future__ import annotations

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

FS = 16000
TONE_S = 0.36
N_TONES = 6
FREQS = [350 * (1.35 ** k) for k in range(N_TONES)]
TOKENS = ["<blank>", "<s>", "</s>", "<unk>"] + [chr(0x4E00 + k)
                                                for k in range(N_TONES)]
FIRST_ID = 4
SEQ_LEN = 6


def tone_wave(seq):
    n = int(FS * TONE_S)
    t = np.arange(n) / FS
    return np.concatenate([
        0.3 * np.sin(2 * np.pi * FREQS[tok - FIRST_ID] * t) for tok in seq
    ]).astype(np.float32)


def train_model():
    from asr2pass_tpu.config import (
        DecoderConfig, EncoderConfig, ParaformerConfig, PredictorConfig,
    )
    from asr2pass_tpu.models import paraformer
    from asr2pass_tpu.runtime.streaming_frontend import offline_frontend
    from asr2pass_tpu.train import train as train_mod

    d = 48
    cfg = ParaformerConfig(
        encoder=EncoderConfig(input_size=560, output_size=d, num_blocks=2,
                              attention_heads=2, linear_units=96),
        decoder=DecoderConfig(num_blocks=1, attention_heads=2,
                              linear_units=96),
        predictor=PredictorConfig(idim=d),
        vocab_size=len(TOKENS),
    )
    rng = np.random.default_rng(0)
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    optimizer = train_mod.make_optimizer(lr=2e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(lambda p, o, b: train_mod.train_step(p, o, b, cfg,
                                                        optimizer))
    t_frames = offline_frontend(tone_wave([FIRST_ID] * SEQ_LEN),
                                cfg.frontend).shape[0]
    print("training the tone model (240 steps)...")
    for it in range(240):
        seqs = rng.integers(FIRST_ID, FIRST_ID + N_TONES, (8, SEQ_LEN))
        feats = np.stack([
            offline_frontend(tone_wave(list(s)), cfg.frontend)
            for s in seqs])
        batch = train_mod.TrainBatch(
            feats=jnp.asarray(feats),
            feat_lens=jnp.full((8,), t_frames, jnp.int32),
            targets=jnp.asarray(seqs, jnp.int32),
            target_lens=jnp.full((8,), SEQ_LEN, jnp.int32),
        )
        params, opt_state, metrics = step(params, opt_state, batch)
        if it % 60 == 0:
            print(f"  step {it}: loss {float(metrics['loss']):.3f} "
                  f"acc {float(metrics['acc']):.2f}")
    return cfg, params


async def serve_and_transcribe(models):
    from asr2pass_tpu.server.ws_server import AsrWsServer

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "clients"))
    from asr_client_api import AsrClient

    server = AsrWsServer(models, host="127.0.0.1", port=0)
    srv = await server.serve()
    port = srv.sockets[0].getsockname()[1]
    print(f"server on ws://127.0.0.1:{port}")
    rng = np.random.default_rng(99)
    ok = 0
    for i in range(4):
        seq = list(rng.integers(FIRST_ID, FIRST_ID + N_TONES, SEQ_LEN))
        expect = "".join(TOKENS[t] for t in seq)
        pcm = (np.clip(tone_wave(seq), -1, 1) * 32767).astype("<i2").tobytes()
        client = AsrClient(f"ws://127.0.0.1:{port}", mode="2pass")
        res = await client.transcribe_pcm(pcm, wav_name=f"demo{i}")
        match = "OK " if res["text"] == expect else "DIFF"
        ok += res["text"] == expect
        print(f"  [{match}] expect: {expect}   got: {res['text']}")
    srv.close()
    await srv.wait_closed()
    server.executor.shutdown(wait=False)
    print(f"{ok}/4 exact matches through the full 2pass websocket path")


def main():
    from asr2pass_tpu.config import VadConfig
    from asr2pass_tpu.models import fsmn_vad
    from asr2pass_tpu.runtime.model_zoo import (
        load_offline_bundle, save_offline_bundle,
    )
    from asr2pass_tpu.server.engine import ServerModels

    cfg, params = train_model()
    out_dir = "/tmp/asr2pass_demo_model"
    save_offline_bundle(out_dir, params, cfg, TOKENS)
    print(f"saved model dir -> {out_dir}")
    b = load_offline_bundle(out_dir)
    models = ServerModels(
        asr_params=b.params, asr_cfg=b.cfg, vocab=b.vocab,
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
    )
    asyncio.run(serve_and_transcribe(models))


if __name__ == "__main__":
    main()
