#!/usr/bin/env python3
"""Websocket ASR client — speaks the reference protocol.

Our own implementation of the role of clients/python/funasr_wss_client.py:
wav/scp/pcm input, offline/online/2pass modes, chunked real-time send
(stride = 60 * chunk_size[1] / chunk_interval ms of PCM per frame), hotword
file, per-wav .asr.txt outputs, multiprocess scp sharding.
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import ssl
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=10095)
    p.add_argument("--mode", default="2pass",
                   choices=["offline", "online", "2pass"])
    p.add_argument("--audio_in", default=None,
                   help="wav/pcm path or wav.scp (kaldi 'name path' lines)")
    p.add_argument("--audio_fs", type=int, default=16000)
    p.add_argument("--chunk_size", default="5,10,5")
    p.add_argument("--chunk_interval", type=int, default=10)
    p.add_argument("--hotword", default="")
    p.add_argument("--use_itn", type=int, default=1)
    p.add_argument("--svs_lang", default="auto")
    p.add_argument("--svs_itn", type=int, default=1)
    p.add_argument("--vad_tail_sil", type=int, default=800)
    p.add_argument("--vad_max_len", type=int, default=60000)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--ssl", type=int, default=0)
    p.add_argument("--thread_num", type=int, default=1)
    p.add_argument("--realtime", type=int, default=0,
                   help="sleep between chunks to simulate real-time")
    return p.parse_args()


def load_wav_list(args):
    wavs = []
    if args.audio_in is None:
        return wavs
    if args.audio_in.endswith(".scp"):
        with open(args.audio_in) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2:
                    wavs.append((parts[0], parts[1]))
                elif parts:
                    wavs.append((os.path.basename(parts[0]), parts[0]))
    else:
        wavs.append((os.path.splitext(os.path.basename(args.audio_in))[0],
                     args.audio_in))
    return wavs


def load_hotwords(path):
    if not path or not os.path.exists(path):
        return ""
    d = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 2:
                try:
                    d[" ".join(parts[:-1])] = int(parts[-1])
                    continue
                except ValueError:
                    pass
            if parts and parts[0]:
                d[parts[0]] = 20
    return json.dumps(d, ensure_ascii=False)


def read_audio_bytes(path, fs):
    if path.endswith(".pcm"):
        with open(path, "rb") as f:
            return f.read()
    from asr2pass_tpu.frontend.audio import load_audio_file
    import numpy as np

    x = load_audio_file(path, fs)
    return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()


async def run_one(args, wav_name, wav_path, results):
    import websockets

    chunk_size = [int(x) for x in args.chunk_size.split(",")]
    ssl_ctx = None
    proto = "ws"
    if args.ssl:
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ssl_ctx.check_hostname = False
        ssl_ctx.verify_mode = ssl.CERT_NONE
        proto = "wss"
    uri = f"{proto}://{args.host}:{args.port}"
    audio_bytes = read_audio_bytes(wav_path, args.audio_fs)
    stride = int(60 * chunk_size[1] / args.chunk_interval / 1000
                 * args.audio_fs * 2)
    async with websockets.connect(uri, ssl=ssl_ctx, max_size=1 << 30) as ws:
        first = {
            "mode": args.mode, "chunk_size": chunk_size,
            "chunk_interval": args.chunk_interval,
            "audio_fs": args.audio_fs, "wav_name": wav_name,
            "wav_format": "pcm", "is_speaking": True,
            "hotwords": load_hotwords(args.hotword),
            "itn": bool(args.use_itn), "svs_itn": bool(args.svs_itn),
            "vad_tail_sil": args.vad_tail_sil,
            "vad_max_len": args.vad_max_len, "svs_lang": args.svs_lang,
        }
        await ws.send(json.dumps(first, ensure_ascii=False))

        async def sender():
            n = max(1, (len(audio_bytes) - 1) // stride + 1)
            for i in range(n):
                await ws.send(audio_bytes[i * stride: (i + 1) * stride])
                if args.realtime and args.mode != "offline":
                    await asyncio.sleep(
                        60 * chunk_size[1] / args.chunk_interval / 1000)
            await ws.send(json.dumps({"is_speaking": False}))

        async def receiver():
            text_2pass_online = ""
            text_2pass_offline = ""
            text = ""
            timestamp = ""
            while True:
                msg = json.loads(await ws.recv())
                if msg.get("mode") == "2pass-online":
                    text_2pass_online += msg.get("text", "")
                elif msg.get("mode") == "2pass-offline":
                    text_2pass_online = ""
                    text_2pass_offline += msg.get("text", "")
                else:
                    text += msg.get("text", "")
                if "timestamp" in msg:
                    timestamp = msg["timestamp"]
                display = (text_2pass_offline + text_2pass_online) or text
                print(f"\r{wav_name}: {display}", end="", flush=True)
                if msg.get("is_final"):
                    print()
                    return display, timestamp

        send_task = asyncio.create_task(sender())
        final_text, timestamp = await receiver()
        await send_task
        results[wav_name] = (final_text, timestamp)
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            out = os.path.join(args.output_dir, f"{wav_name}.asr.txt")
            with open(out, "a", encoding="utf-8") as f:
                if timestamp:
                    f.write(f"{wav_name}\t{final_text}\t{timestamp}\n")
                else:
                    f.write(f"{wav_name}\t{final_text}\n")


async def amain(args):
    wavs = load_wav_list(args)
    results = {}
    sem = asyncio.Semaphore(args.thread_num)

    async def guarded(name, path):
        async with sem:
            await run_one(args, name, path, results)

    await asyncio.gather(*(guarded(n, p) for n, p in wavs))
    return results


if __name__ == "__main__":
    asyncio.run(amain(parse_args()))
