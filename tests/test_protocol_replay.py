"""Protocol conformance replay vs the reference client (VERDICT r3 #9).

Replays the EXACT message sequences the reference's own client emits
(/root/reference/clients/python/funasr_wss_client.py:237-347: first-JSON
field set with its argparse defaults, the 60*chunk/interval stride
formula, trailing {"is_speaking": false}) against our server, and
asserts field-for-field result compatibility with what that client's
receive loop consumes: `text` str, `mode` in its four-way dispatch set,
`wav_name` echo, `is_final` ordering, `timestamp` as a JSON STRING of
[start_ms, end_ms] pairs, `stamp_sents` as a parsed list of
{text_seg, punc, start, end, ts_list} records (the schema the reference
server emits at websocket-server-2pass.cpp:78-96 from
util.cpp TimestampSentence)."""
import asyncio
import json

import jax
import numpy as np
import pytest

from asr2pass_tpu.config import (
    VadConfig,
    paraformer_tiny,
    punc_tiny,
)
from asr2pass_tpu.models import ct_transformer, fsmn_vad, paraformer
from asr2pass_tpu.server.engine import ServerModels
from asr2pass_tpu.server.ws_server import AsrWsServer
from asr2pass_tpu.text.punc_tokenizer import PuncTokenizer
from asr2pass_tpu.text.vocab import make_test_vocab


def _ts_cfg():
    """Tiny Paraformer WITH the bicif timestamp head, so offline results
    carry timestamp/stamp_sents like the reference's
    paraformer-large-hotword-timestamp deployment."""
    import dataclasses

    from asr2pass_tpu.config import PredictorConfig

    cfg = paraformer_tiny()
    return dataclasses.replace(
        cfg, predictor=PredictorConfig(idim=64, use_timestamp=True))


@pytest.fixture(scope="module")
def models():
    acfg = _ts_cfg()
    pcfg = punc_tiny(vocab_size=300)
    return ServerModels(
        asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
        asr_cfg=acfg,
        vocab=make_test_vocab(acfg.vocab_size),
        vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
        vad_cfg=VadConfig(),
        punc_params=ct_transformer.init(jax.random.PRNGKey(2), pcfg),
        punc_cfg=pcfg,
        punc_tokenizer=PuncTokenizer(
            ["<blank>", "<unk>"] + [chr(0x4E00 + i) for i in range(200)]),
    )


def _reference_first_message(mode, wav_name):
    """funasr_wss_client.py:241-244 verbatim field set, with that
    client's argparse defaults (chunk_size '5, 10, 5', chunk_interval
    10, audio_fs 16000, use_itn 1, svs_itn 1, vad_tail_sil 350,
    vad_max_len 20000, svs_lang auto, hotwords as a json dict string)."""
    return json.dumps({
        "mode": mode,
        "chunk_size": [int(x) for x in "5, 10, 5".split(",")],
        "chunk_interval": 10,
        "audio_fs": 16000,
        "wav_name": wav_name,
        "wav_format": "pcm",
        "is_speaking": True,
        "hotwords": json.dumps({"阿里巴巴": 20}),
        "itn": True,
        "svs_itn": True,
        "vad_tail_sil": 350,
        "vad_max_len": 20000,
        "svs_lang": "auto",
    })


async def _reference_replay(port, mode, wav_name, audio_bytes,
                            realtime=False):
    """The reference client's send loop + a faithful model of its receive
    loop (funasr_wss_client.py:258-267, 283-347). Returns every message
    received until its is_final/offline termination condition."""
    import websockets

    chunk_size = [5, 10, 5]
    chunk_interval = 10
    sample_rate = 16000
    stride = int(60 * chunk_size[1] / chunk_interval / 1000
                 * sample_rate * 2)
    msgs = []
    async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
        await ws.send(_reference_first_message(mode, wav_name))
        chunk_num = (len(audio_bytes) - 1) // stride + 1
        for i in range(chunk_num):
            await ws.send(audio_bytes[i * stride: (i + 1) * stride])
            if i == chunk_num - 1:
                await ws.send(json.dumps({"is_speaking": False}))
            if realtime:
                await asyncio.sleep(60 * chunk_size[1]
                                    / chunk_interval / 1000)
            else:
                await asyncio.sleep(0.001)
        while True:
            meg = json.loads(await asyncio.wait_for(ws.recv(),
                                                    timeout=120))
            msgs.append(meg)
            # the reference receive loop KeyErrors without "text" — hard
            # requirement on every message
            assert isinstance(meg["text"], str)
            if mode == "offline" and meg.get("mode") == "offline":
                break           # its offline_msg_done condition
            if meg.get("is_final"):
                break
    return msgs


async def _with_server(models, coro_fn, **server_kw):
    server = AsrWsServer(models, host="127.0.0.1", port=0, **server_kw)
    srv = await server.serve()
    port = srv.sockets[0].getsockname()[1]
    try:
        return await coro_fn(port)
    finally:
        if getattr(server, "_engine_task", None) is not None:
            server._engine_task.cancel()
        srv.close()
        await srv.wait_closed()
        if server.engine is not None:
            server.engine.shutdown()
        server.executor.shutdown(wait=False)


def _pcm_bytes(seconds, seed):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(int(16000 * seconds)) * 0.1).clip(-1, 1)
    return (x * 32767).astype("<i2").tobytes()


def _assert_timestamp_schema(meg):
    """timestamp must be the STRING form the reference client
    concatenates (meg['timestamp'] + '\\n'), parsing to [s_ms, e_ms]
    pairs; stamp_sents the parsed record list the reference server
    builds at websocket-server-2pass.cpp:84-96."""
    if "timestamp" not in meg:
        return
    ts = meg["timestamp"]
    assert isinstance(ts, str)
    parsed = json.loads(ts)
    assert isinstance(parsed, list)
    for pair in parsed:
        assert (isinstance(pair, list) and len(pair) == 2
                and all(isinstance(v, int) for v in pair))
        assert 0 <= pair[0] <= pair[1]
    sents = meg.get("stamp_sents")
    assert isinstance(sents, list)
    for rec in sents:
        assert set(rec) == {"text_seg", "punc", "start", "end", "ts_list"}
        assert isinstance(rec["text_seg"], str)
        assert isinstance(rec["punc"], str)
        assert isinstance(rec["start"], int)
        assert isinstance(rec["end"], int)
        assert isinstance(rec["ts_list"], list)


def test_replay_2pass(models):
    msgs = asyncio.run(_with_server(
        models, lambda port: _reference_replay(
            port, "2pass", "w2p", _pcm_bytes(2.4, seed=1))))
    modes = [m.get("mode") for m in msgs]
    # the reference client's 4-way dispatch: every mode must be one it
    # handles for 2pass sessions
    assert set(modes) <= {"2pass-online", "2pass-offline", "2pass"}
    assert "2pass-online" in modes
    assert "2pass-offline" in modes
    for m in msgs:
        assert m["wav_name"] == "w2p"
        assert isinstance(m["is_final"], bool)
        _assert_timestamp_schema(m)
    # is_final ordering: exactly one final, and it terminates the stream
    finals = [i for i, m in enumerate(msgs) if m["is_final"]]
    assert finals == [len(msgs) - 1]
    # the timestamped deployment actually emitted timestamps on pass-2
    assert any("timestamp" in m for m in msgs
               if m.get("mode") == "2pass-offline")


def test_replay_offline(models):
    msgs = asyncio.run(_with_server(
        models, lambda port: _reference_replay(
            port, "offline", "woff", _pcm_bytes(2.0, seed=2))))
    # offline: exactly ONE result, mode=offline, is_final True
    assert len(msgs) == 1
    m = msgs[0]
    assert m["mode"] == "offline"
    assert m["wav_name"] == "woff"
    assert m["is_final"] is True
    assert m["text"]
    _assert_timestamp_schema(m)
    assert "timestamp" in m


def test_replay_online(models):
    msgs = asyncio.run(_with_server(
        models, lambda port: _reference_replay(
            port, "online", "won", _pcm_bytes(1.8, seed=3),
            realtime=False)))
    assert all(m.get("mode") in ("online",) or m["is_final"]
               for m in msgs)
    assert any(m.get("mode") == "online" and m["text"] for m in msgs)
    assert msgs[-1]["is_final"] is True


def test_replay_2pass_engine_mode(models):
    """The engine-batched server speaks the identical wire contract."""
    msgs = asyncio.run(_with_server(
        models, lambda port: _reference_replay(
            port, "2pass", "weng", _pcm_bytes(2.4, seed=4)),
        use_engine=True, engine_capacity=4))
    modes = [m.get("mode") for m in msgs]
    assert set(modes) <= {"2pass-online", "2pass-offline", "2pass"}
    assert "2pass-offline" in modes
    for m in msgs:
        assert m["wav_name"] == "weng"
        _assert_timestamp_schema(m)
    finals = [i for i, m in enumerate(msgs) if m["is_final"]]
    assert finals == [len(msgs) - 1]


def test_replay_2pass_engine_overlap_decide_async(models):
    """The high-capacity scheduling flags (double-buffered staging
    upload + async decide lane) must not change the wire contract:
    same message sequence invariants as the plain engine replay."""
    msgs = asyncio.run(_with_server(
        models, lambda port: _reference_replay(
            port, "2pass", "wov", _pcm_bytes(2.4, seed=5)),
        use_engine=True, engine_capacity=4,
        upload_overlap=True, decide_async=True))
    modes = [m.get("mode") for m in msgs]
    assert set(modes) <= {"2pass-online", "2pass-offline", "2pass"}
    assert "2pass-offline" in modes
    for m in msgs:
        assert m["wav_name"] == "wov"
        _assert_timestamp_schema(m)
    finals = [i for i, m in enumerate(msgs) if m["is_final"]]
    assert finals == [len(msgs) - 1]
