#!/usr/bin/env python3
"""Programmatic ASR client API + transcription checker.

Role of clients/python/ASR_client_api.py (async send/recv class) and
asr_check.py (transcribe + per-line CER vs reference). Usage:

    from clients.asr_client_api import AsrClient
    client = AsrClient("ws://localhost:10096", mode="offline")
    text = asyncio.run(client.transcribe_file("a.wav"))
"""
from __future__ import annotations

import asyncio
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class AsrClient:
    def __init__(self, url: str, mode: str = "offline",
                 chunk_size=(5, 10, 5), chunk_interval: int = 10,
                 hotwords: dict | None = None, use_itn: bool = True,
                 audio_fs: int = 16000, svs_lang: str = "auto",
                 svs_itn: bool = True):
        self.url = url
        self.mode = mode
        self.chunk_size = list(chunk_size)
        self.chunk_interval = chunk_interval
        self.hotwords = hotwords or {}
        self.use_itn = use_itn
        self.audio_fs = audio_fs
        self.svs_lang = svs_lang
        self.svs_itn = svs_itn

    async def transcribe_pcm(self, pcm_bytes: bytes, wav_name: str = "api"
                             ) -> dict:
        import websockets

        result = {"text": "", "timestamp": "", "partials": []}
        async with websockets.connect(self.url, max_size=1 << 30) as ws:
            await ws.send(json.dumps({
                "mode": self.mode, "chunk_size": self.chunk_size,
                "chunk_interval": self.chunk_interval,
                "audio_fs": self.audio_fs, "wav_name": wav_name,
                "wav_format": "pcm", "is_speaking": True,
                "hotwords": json.dumps(self.hotwords, ensure_ascii=False),
                "itn": self.use_itn,
                "svs_lang": self.svs_lang, "svs_itn": self.svs_itn,
            }))
            stride = int(60 * self.chunk_size[1] / self.chunk_interval
                         / 1000 * self.audio_fs * 2)
            for i in range(0, len(pcm_bytes), stride):
                await ws.send(pcm_bytes[i: i + stride])
            await ws.send(json.dumps({"is_speaking": False}))
            online = ""
            offline = ""
            while True:
                msg = json.loads(await ws.recv())
                mode = msg.get("mode", "")
                if mode.endswith("online"):
                    online += msg.get("text", "")
                    result["partials"].append(msg.get("text", ""))
                else:
                    online = ""
                    offline += msg.get("text", "")
                if "timestamp" in msg:
                    result["timestamp"] = msg["timestamp"]
                if msg.get("is_final"):
                    break
            result["text"] = offline + online
        return result

    async def transcribe_file(self, path: str, wav_name: str | None = None
                              ) -> dict:
        from asr2pass_tpu.frontend.audio import load_audio_file

        wave = load_audio_file(path, self.audio_fs)
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        res = await self.transcribe_pcm(
            pcm, wav_name or os.path.basename(path))
        res["audio_s"] = len(wave) / self.audio_fs
        return res


async def check_transcripts(url: str, scp_path: str, ref_text_path: str,
                            mode: str = "offline"):
    """asr_check.py role: transcribe an scp and report per-line + total CER
    against a reference kaldi text file."""
    from asr2pass_tpu.tools.compute_wer import WerStats, load_trn, score_pair

    refs = load_trn(ref_text_path)
    client = AsrClient(url, mode=mode)
    stats = WerStats()
    with open(scp_path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            name, path = (parts[0], parts[1]) if len(parts) > 1 \
                else (os.path.basename(parts[0]), parts[0])
            res = await client.transcribe_file(path, name)
            ref = refs.get(name, "")
            stats, per = score_pair(ref, res["text"], stats)
            print(f"{name}\tCER {per['wer']*100:.2f}%\t{res['text']}")
    print(f"TOTAL CER {stats.wer*100:.2f}% "
          f"({stats.errors}/{stats.ref_len})")
    return stats


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--url", default="ws://localhost:10096")
    p.add_argument("--mode", default="offline")
    p.add_argument("--scp", required=True)
    p.add_argument("--ref-text", default="")
    args = p.parse_args()
    if args.ref_text:
        asyncio.run(check_transcripts(args.url, args.scp, args.ref_text,
                                      args.mode))
    else:
        async def run():
            client = AsrClient(args.url, mode=args.mode)
            with open(args.scp, encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if not parts:
                        continue
                    name, path = (parts[0], parts[1]) if len(parts) > 1 \
                        else (os.path.basename(parts[0]), parts[0])
                    res = await client.transcribe_file(path, name)
                    print(f"{name}\t{res['text']}")

        asyncio.run(run())
