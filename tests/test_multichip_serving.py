"""Multi-chip SERVING reachability (VERDICT r3 missing #4): tensor
parallelism reachable from the serving entry points, and per-chip process
pinning for data-parallel server fleets — on the 8-device virtual CPU
mesh (conftest forces JAX_PLATFORMS=cpu with 8 devices)."""
import asyncio
import json
import os
import socket
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from asr2pass_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    ParaformerConfig,
    PredictorConfig,
)
from asr2pass_tpu.models import paraformer
from asr2pass_tpu.parallel.sharding import make_mesh
from asr2pass_tpu.runtime.offline_asr import ParaformerOffline
from asr2pass_tpu.text.vocab import make_test_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(d=32, tp=2):
    return ParaformerConfig(
        encoder=EncoderConfig(input_size=560, output_size=d, num_blocks=2,
                              attention_heads=tp, linear_units=4 * d),
        decoder=DecoderConfig(num_blocks=2, attention_heads=tp,
                              linear_units=4 * d),
        predictor=PredictorConfig(idim=d),
        vocab_size=64,
    )


def test_tp_recognizer_serving_parity():
    """ParaformerOffline with a ('dp','tp') mesh — the run_server
    --tp-devices path — decodes raw audio to the same text as the
    unsharded recognizer (GSPMD collectives are numerically faithful)."""
    cfg = _cfg()
    params = paraformer.init(jax.random.PRNGKey(0), cfg)
    vocab = make_test_vocab(cfg.vocab_size)
    rng = np.random.default_rng(3)
    segs = [(rng.standard_normal(16000 * s) * 0.1).astype(np.float32)
            for s in (1, 2)]

    ref = ParaformerOffline(params, cfg, vocab).recognize_batch(segs)
    mesh = make_mesh(8, tp=8)       # dp=1: any serving batch size valid
    tp = ParaformerOffline(params, cfg, vocab,
                           tp_mesh=mesh).recognize_batch(segs)
    assert [t for t, _ in tp] == [t for t, _ in ref]
    assert all(t for t, _ in ref)   # non-degenerate

    # dp x tp factorization also serves
    mesh2 = make_mesh(8, tp=2)
    tp2 = ParaformerOffline(params, cfg, vocab,
                            tp_mesh=mesh2).recognize_batch(segs)
    assert [t for t, _ in tp2] == [t for t, _ in ref]


def test_tp_mesh_plumbs_through_server_models():
    """ServerModels.tp_mesh reaches the offline recognizer (and therefore
    every served pass-2 decode) — a transcription through
    create_offline_recognizer runs on sharded params."""
    from asr2pass_tpu.config import VadConfig
    from asr2pass_tpu.models import fsmn_vad
    from asr2pass_tpu.server.engine import ServerModels

    cfg = _cfg()
    mesh = make_mesh(8, tp=8)
    models = ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), cfg),
        asr_cfg=cfg,
        vocab=make_test_vocab(cfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
        tp_mesh=mesh,
    )
    rec = models.create_offline_recognizer()
    assert rec.asr.tp_mesh is mesh
    # a param leaf is actually sharded over the tp axis
    leaf = rec.asr.params["encoder"]["first"]["att"]["qkv"]["w"]
    assert len(leaf.sharding.device_set) == 8
    rng = np.random.default_rng(5)
    res = rec.transcribe((rng.standard_normal(16000) * 0.1
                          ).astype(np.float32))
    assert isinstance(res.text, str) and res.text


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_run_server_device_pinning():
    """run_server --device K (the per-chip DP fleet contract that
    run_all_servers drives, one engine process per chip): the process
    pins to virtual CPU device 3 of 8 and serves a full 2pass
    roundtrip."""
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "run_server.py"),
         "--demo", "--cpu", "--device", "3", "--port", str(port)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise AssertionError(f"server died: {out[-2000:]}")
            try:
                socket.create_connection(("127.0.0.1", port),
                                         timeout=1).close()
                break
            except OSError:
                time.sleep(0.5)
        else:
            raise AssertionError("server never listened")

        async def client():
            import websockets

            rng = np.random.default_rng(0)
            pcm = ((rng.standard_normal(16000) * 0.1).clip(-1, 1)
                   * 32767).astype("<i2").tobytes()
            async with websockets.connect(
                    f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({
                    "mode": "2pass", "chunk_size": [5, 10, 5],
                    "audio_fs": 16000, "wav_name": "pin",
                    "wav_format": "pcm", "is_speaking": True}))
                await ws.send(pcm)
                await ws.send(json.dumps({"is_speaking": False}))
                while True:
                    m = json.loads(await asyncio.wait_for(ws.recv(),
                                                          timeout=120))
                    if m.get("is_final"):
                        return m

        final = asyncio.run(client())
        assert final["is_final"] is True
    finally:
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    assert "pinned to device" in out
    assert "id=3" in out or "TFRT_CPU_3" in out or "CpuDevice(3)" in out


def test_run_all_servers_build_cmd_device_env():
    """Fleet supervisor: a `device:` entry masks the child's TPU
    visibility AND passes --device (CPU fallback) — one process per
    chip (supervisord.conf:11-45 role on TPU)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import run_all_servers as ras
    finally:
        sys.path.pop(0)
    cmd, env = ras.build_cmd({"name": "x", "port": 1, "demo": True,
                              "device": 2, "engine": True,
                              "tp_devices": 4})
    assert env["TPU_VISIBLE_DEVICES"] == "2"
    assert "--device" in cmd and cmd[cmd.index("--device") + 1] == "2"
    assert "--engine" in cmd
    assert "--tp-devices" in cmd
