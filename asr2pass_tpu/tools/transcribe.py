#!/usr/bin/env python3
"""Bulk transcription: wav.scp -> per-wav transcripts, in-process.

Role of run_transcribe_audio.sh + the client fan-out (SURVEY.md §2.3 #36),
but without needing a server round-trip: loads the offline pipeline once
and streams the scp through bucket-batched pass-2 inference.

CLI: python -m asr2pass_tpu.tools.transcribe --scp wav.scp \
        --model-dir DIR [--vad-dir DIR] [--punc-dir DIR] [--itn] \
        --output-dir out/
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_recognizer(args):
    """Offline pipeline from model-dir CLI args (shared by transcribe
    and tools/eval_cer): Paraformer (--model-dir) or SenseVoice
    (--svs-dir) pass-2, each composing with --vad-dir/--punc-dir/--itn
    identically."""
    from asr2pass_tpu.runtime.model_zoo import load_offline_bundle, load_params
    from asr2pass_tpu.runtime.offline_api import OfflineRecognizer
    from asr2pass_tpu.runtime.offline_asr import ParaformerOffline

    if getattr(args, "svs_dir", ""):
        from asr2pass_tpu.runtime.model_zoo import load_svs_bundle
        from asr2pass_tpu.runtime.sensevoice_asr import SenseVoiceOffline

        b = load_svs_bundle(args.svs_dir)
        asr = SenseVoiceOffline(b.params, b.cfg, b.vocab, cmvn=b.cmvn)
    else:
        b = load_offline_bundle(args.model_dir)
        asr = ParaformerOffline(b.params, b.cfg, b.vocab, cmvn=b.cmvn)
    vad_params = vad_cfg = vad_cmvn = None
    if args.vad_dir:
        from asr2pass_tpu.config import VadConfig, load_vad_yaml
        from asr2pass_tpu.frontend.audio import parse_kaldi_cmvn

        vy = os.path.join(args.vad_dir, "config.yaml")
        vad_cfg = (load_vad_yaml(vy) if os.path.exists(vy)
                   else VadConfig())
        vad_params = load_params(os.path.join(args.vad_dir, "weights.npz"))
        mvn = os.path.join(args.vad_dir, "am.mvn")
        if os.path.exists(mvn):
            vad_cmvn = parse_kaldi_cmvn(mvn)
    punc = None
    if args.punc_dir:
        from asr2pass_tpu.runtime.model_zoo import load_punc_dir
        from asr2pass_tpu.runtime.punc import Punctuator

        punc = Punctuator(*load_punc_dir(args.punc_dir))
    itn = None
    if args.itn:
        from asr2pass_tpu.text.itn import ChineseITN

        itn = ChineseITN()
    return OfflineRecognizer(asr, vad_params=vad_params, vad_cfg=vad_cfg,
                             vad_cmvn=vad_cmvn, punc=punc, itn=itn)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scp", required=True)
    p.add_argument("--model-dir", default="")
    p.add_argument("--svs-dir", default="",
                   help="SenseVoice model dir instead of --model-dir")
    p.add_argument("--vad-dir", default="")
    p.add_argument("--punc-dir", default="")
    p.add_argument("--itn", action="store_true")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--fs", type=int, default=16000)
    args = p.parse_args(argv)
    if not args.model_dir and not args.svs_dir:
        p.error("need --model-dir or --svs-dir")

    from asr2pass_tpu.frontend.audio import load_audio_file

    rec = build_recognizer(args)
    os.makedirs(args.output_dir, exist_ok=True)
    text_path = os.path.join(args.output_dir, "text")
    total_audio = 0.0
    t0 = time.time()
    with open(args.scp, encoding="utf-8") as scp, \
            open(text_path, "w", encoding="utf-8") as out:
        for line in scp:
            parts = line.strip().split()
            if not parts:
                continue
            name, path = (parts[0], parts[1]) if len(parts) > 1 \
                else (os.path.basename(parts[0]), parts[0])
            wave = load_audio_file(path, args.fs)
            res = rec.transcribe(wave)
            total_audio += res.snippet_time
            out.write(f"{name}\t{res.text}\n")
            with open(os.path.join(args.output_dir, f"{name}.asr.txt"),
                      "w", encoding="utf-8") as f:
                f.write(res.text + "\n")
    dt = time.time() - t0
    rtf = total_audio / dt if dt else 0.0
    print(f"transcribed {total_audio:.1f}s audio in {dt:.1f}s "
          f"({rtf:.1f}x realtime) -> {text_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
