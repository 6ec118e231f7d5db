"""End-to-end: the dependency-free C++ websocket client against the
in-process server."""
import asyncio
import os
import shutil
import subprocess

import jax
import numpy as np
import pytest

from asr2pass_tpu.config import VadConfig, paraformer_tiny
from asr2pass_tpu.models import fsmn_vad, paraformer
from asr2pass_tpu.server.engine import ServerModels
from asr2pass_tpu.server.ws_server import AsrWsServer
from asr2pass_tpu.text.vocab import make_test_vocab

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(ROOT, "clients", "cpp")


@pytest.fixture(scope="module")
def client_bin():
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    return os.path.join(CPP_DIR, "ws_client")


def test_cpp_client_roundtrip(client_bin, tmp_path):
    acfg = paraformer_tiny()
    models = ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
    )
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(32000) * 0.1 * 32767).astype("<i2")
    pcm_path = str(tmp_path / "a.pcm")
    pcm.tofile(pcm_path)

    async def run():
        server = AsrWsServer(models, host="127.0.0.1", port=0)
        srv = await server.serve()
        port = srv.sockets[0].getsockname()[1]
        try:
            proc = await asyncio.create_subprocess_exec(
                client_bin, "127.0.0.1", str(port), "2pass", pcm_path,
                stdout=asyncio.subprocess.PIPE,
                stderr=asyncio.subprocess.PIPE)
            out, err = await asyncio.wait_for(proc.communicate(), timeout=120)
            return proc.returncode, out.decode(), err.decode()
        finally:
            srv.close()
            await srv.wait_closed()
            server.executor.shutdown(wait=False)

    rc, out, err = asyncio.run(run())
    assert rc == 0, err
    assert len(out.strip()) > 0  # partial/final text printed


def test_mic_client_file_source(client_bin, tmp_path):
    """mic_client_2pass (the portaudio-mic-client role,
    funasr-wss-client-2pass.cpp) with its --file real-time source speaks
    the 2pass protocol end-to-end and prints committed text."""
    mic_bin = os.path.join(CPP_DIR, "mic_client_2pass")
    assert os.path.exists(mic_bin)
    acfg = paraformer_tiny()
    models = ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
    )
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(24000) * 0.1 * 32767).astype("<i2")
    pcm_path = str(tmp_path / "m.pcm")
    pcm.tofile(pcm_path)

    async def run():
        server = AsrWsServer(models, host="127.0.0.1", port=0)
        srv = await server.serve()
        port = srv.sockets[0].getsockname()[1]
        try:
            proc = await asyncio.create_subprocess_exec(
                mic_bin, "127.0.0.1", str(port), "--file", pcm_path,
                stdout=asyncio.subprocess.PIPE,
                stderr=asyncio.subprocess.PIPE)
            out, err = await asyncio.wait_for(proc.communicate(),
                                              timeout=180)
            return proc.returncode, out.decode(), err.decode()
        finally:
            srv.close()
            await srv.wait_closed()
            server.executor.shutdown(wait=False)

    rc, out, err = asyncio.run(run())
    assert rc == 0, err
    assert len(out.strip()) > 0   # some text was displayed
