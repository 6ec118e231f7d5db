#!/usr/bin/env python3
"""Launch the websocket ASR server from model directories.

Role of funasr-wss-server-2pass.cpp main (TCLAP flags at :40-170): point at
model directories (our npz layout, see runtime/model_zoo.py) and serve the
reference websocket protocol. With --demo, builds random-weight demo models
(useful for protocol/load testing without trained weights).
"""
from __future__ import annotations

import argparse
import logging
import os
import ssl
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", help="offline (pass-2) model directory")
    p.add_argument("--online-model-dir", help="streaming model directory")
    p.add_argument("--vad-dir", help="VAD model directory")
    p.add_argument("--punc-dir", help="punctuation model directory")
    p.add_argument("--svs-dir",
                   help="SenseVoice-small model dir (pass-2 alternative; "
                        "the reference's MODEL_SVS role). When set, 2pass "
                        "finals and offline uploads decode through "
                        "SenseVoice instead of the offline Paraformer")
    p.add_argument("--svs-beam", type=int, default=0,
                   help="SenseVoice CTC prefix-beam width (0/1 = greedy; "
                        "hotworded connections always get the context-"
                        "biased beam, sensevoice-small.cpp:392-440)")
    p.add_argument("--lm-dir", help="n-gram LM dir: either a compiled "
                                    "TLG graph (TLG.fst + words.txt + "
                                    "tokens.txt, the reference artifact "
                                    "layout / tools/build_tlg.py) or "
                                    "lm.arpa + lexicon.txt "
                                    "(tools/build_lm.py)")
    p.add_argument("--lm-weight", type=float, default=0.5)
    p.add_argument("--itn-dir",
                   help="ITN model dir holding zh_itn_tagger.fst + "
                        "zh_itn_verbalizer.fst (the reference's "
                        "--itn-model-dir; shorthand for the two flags "
                        "below)")
    p.add_argument("--itn-tagger", help="compiled ITN tagger FST (the "
                                        "reference's zh_itn_tagger.fst)")
    p.add_argument("--itn-verbalizer",
                   help="compiled ITN verbalizer FST "
                        "(zh_itn_verbalizer.fst)")
    p.add_argument("--itn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ITN on finals (default on, like the reference's "
                        "2pass launch scripts; --no-itn to disable)")
    p.add_argument("--hotword-file", default="")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=10095)
    p.add_argument("--decode-workers", type=int, default=1)
    p.add_argument("--engine", action="store_true",
                   help="batched StreamEngine serving (one jitted step "
                        "advances all connections)")
    p.add_argument("--engine-capacity", type=int, default=128)
    p.add_argument("--upload-overlap", action="store_true",
                   help="engine mode: double-buffer the per-tick staging "
                        "upload on a dedicated lane (for capacities past "
                        "the upload roofline; see bench.py sweep)")
    p.add_argument("--decide-async", action="store_true",
                   help="engine mode: VAD automaton/splitter on the "
                        "decide lane (recommended with --upload-overlap "
                        "at --engine-capacity >= 512)")
    p.add_argument("--max-message-mb", type=int, default=16,
                   help="max websocket frame size (MB)")
    p.add_argument("--max-upload-mb", type=int, default=256,
                   help="max per-connection offline upload size (MB)")
    p.add_argument("--certfile", default="")
    p.add_argument("--keyfile", default="")
    p.add_argument("--tp-devices", type=int, default=0,
                   help="shard the pass-2 model Megatron-style over this "
                        "many devices (tensor parallelism; 0 = off). For "
                        "models too big for one chip's HBM — GSPMD "
                        "inserts the ICI collectives from the sharding "
                        "rules (parallel/sharding.py)")
    p.add_argument("--device", type=int, default=-1,
                   help="pin this server process to one device index "
                        "(per-chip data parallelism: run_all_servers "
                        "starts one process per chip; -1 = default)")
    p.add_argument("--sp-devices", type=int, default=0,
                   help="shard offline segments longer than --sp-threshold"
                        " LFR frames over this many devices (sequence "
                        "parallelism; 0 = off). Lets a request exceed the "
                        "single-chip 61 s bucket without VAD force-cuts.")
    p.add_argument("--sp-threshold", type=int, default=4096,
                   help="LFR frames (60 ms each) above which segments "
                        "take the sequence-parallel path (default 4096: the "
                        "single-chip single-shot attention kernel covers "
                        "T<=4096, scripts/bench_sp.py)")
    p.add_argument("--demo", action="store_true",
                   help="random tiny models (protocol testing)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (this image's site hook "
                        "selects the TPU in every process; see CLAUDE.md)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.device >= 0:
        # per-chip process pinning (the reference's supervisord runs three
        # CPU servers; the TPU equivalent is one engine process per chip):
        # every un-annotated computation and array lands on this device
        import jax

        devs = jax.devices()
        if args.device >= len(devs):
            if len(devs) == 1:
                # TPU_VISIBLE_DEVICES already masked this process down to
                # its one chip — index 0 IS the requested device
                args.device = 0
            else:
                p.error(f"--device {args.device} out of range "
                        f"({len(devs)} devices)")
        jax.config.update("jax_default_device", devs[args.device])
        logging.info("pinned to device %s", devs[args.device])

    if args.demo:
        import jax

        from asr2pass_tpu.config import VadConfig, paraformer_tiny, punc_tiny
        from asr2pass_tpu.models import ct_transformer, fsmn_vad, paraformer
        from asr2pass_tpu.server.engine import ServerModels
        from asr2pass_tpu.text.punc_tokenizer import PuncTokenizer
        from asr2pass_tpu.text.vocab import make_test_vocab

        acfg = paraformer_tiny()
        models = ServerModels(
            asr_params=paraformer.init(jax.random.PRNGKey(0), acfg),
            asr_cfg=acfg,
            vocab=make_test_vocab(acfg.vocab_size),
            vad_params=fsmn_vad.init(jax.random.PRNGKey(1), VadConfig()),
            vad_cfg=VadConfig(),
            punc_params=ct_transformer.init(jax.random.PRNGKey(2),
                                            punc_tiny(300)),
            punc_cfg=punc_tiny(300),
            punc_tokenizer=PuncTokenizer(
                ["<blank>", "<unk>"]
                + [chr(0x4E00 + i) for i in range(200)]),
        )
    else:
        from asr2pass_tpu.runtime.model_zoo import load_offline_bundle
        from asr2pass_tpu.server.engine import ServerModels

        if not args.model_dir:
            p.error("--model-dir required (or --demo)")
        b = load_offline_bundle(args.model_dir)
        models = ServerModels(asr_params=b.params, asr_cfg=b.cfg,
                              vocab=b.vocab, asr_cmvn=b.cmvn)
        # contextual/hotword checkpoints: the converted model_eb compiler
        # rides inside the ASR weights (tools/convert_funasr.py maps
        # bias_encoder/bias_embed -> hotword_compiler); wire it so
        # first-message hotwords compile NN bias embeddings, with the
        # model dir's seg_dict for English BPE pieces (the reference
        # auto-loads both from the hotword model dir,
        # funasr-wss-server-2pass.cpp:195-502)
        if isinstance(b.params, dict) and "hotword_compiler" in b.params:
            from asr2pass_tpu.config import HotwordConfig
            from asr2pass_tpu.models.hotword import SegDict

            models.hotword_params = b.params["hotword_compiler"]
            models.hotword_cfg = HotwordConfig()
            sd_path = os.path.join(args.model_dir, "seg_dict")
            if os.path.exists(sd_path):
                models.seg_dict = SegDict(sd_path)
        if args.online_model_dir:
            ob = load_offline_bundle(args.online_model_dir)
            models.online_params = ob.params
            models.online_cfg = ob.cfg
        if args.vad_dir:
            from asr2pass_tpu.config import VadConfig, load_vad_yaml
            from asr2pass_tpu.frontend.audio import parse_kaldi_cmvn
            from asr2pass_tpu.runtime.model_zoo import load_params

            vy = os.path.join(args.vad_dir, "config.yaml")
            models.vad_cfg = (load_vad_yaml(vy) if os.path.exists(vy)
                              else VadConfig())
            models.vad_params = load_params(
                os.path.join(args.vad_dir, "weights.npz"))
            mvn = os.path.join(args.vad_dir, "am.mvn")
            if os.path.exists(mvn):
                models.vad_cmvn = parse_kaldi_cmvn(mvn)
        if args.punc_dir:
            from asr2pass_tpu.runtime.model_zoo import load_punc_dir

            (models.punc_params, models.punc_cfg,
             models.punc_tokenizer) = load_punc_dir(args.punc_dir)
    if getattr(args, "svs_dir", None):
        from asr2pass_tpu.runtime.model_zoo import load_svs_bundle

        sb = load_svs_bundle(args.svs_dir)
        models.svs_params = sb.params
        models.svs_cfg = sb.cfg
        models.svs_vocab = sb.vocab
        models.svs_cmvn = sb.cmvn
    models.svs_beam = args.svs_beam
    if getattr(args, "lm_dir", None):
        if os.path.exists(os.path.join(args.lm_dir, "TLG.fst")):
            # compiled decoding-graph artifacts (reference layout)
            models.tlg_dir = args.lm_dir
        else:
            from asr2pass_tpu.decode.lm_decoder import Lexicon
            from asr2pass_tpu.decode.ngram import NgramLM

            models.lm = NgramLM.load_arpa(
                os.path.join(args.lm_dir, "lm.arpa"))
            models.lexicon = Lexicon.from_file(
                os.path.join(args.lm_dir, "lexicon.txt"))
        models.lm_weight = args.lm_weight
    if getattr(args, "itn_dir", None):
        args.itn_tagger = (args.itn_tagger
                           or os.path.join(args.itn_dir,
                                           "zh_itn_tagger.fst"))
        args.itn_verbalizer = (args.itn_verbalizer
                               or os.path.join(args.itn_dir,
                                               "zh_itn_verbalizer.fst"))
    if getattr(args, "itn_tagger", None) and \
            getattr(args, "itn_verbalizer", None):
        from asr2pass_tpu.text.itn import FstITN

        models.itn = FstITN(args.itn_tagger, args.itn_verbalizer)
    elif args.itn:
        from asr2pass_tpu.text.itn import ChineseITN

        models.itn = ChineseITN()
    if args.hotword_file and os.path.exists(args.hotword_file):
        # server-side hotwords merged with per-connection ones
        # (ExtractHws role, util.cpp:1001-1096)
        hws = {}
        with open(args.hotword_file, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split(" ")
                if len(parts) >= 2:
                    try:
                        hws[" ".join(parts[:-1])] = int(parts[-1])
                        continue
                    except ValueError:
                        pass
                if parts and parts[0]:
                    hws[parts[0]] = 20
        models.server_hotwords = hws

    if args.sp_devices:
        import jax as _jax
        import numpy as _np
        from jax.sharding import Mesh

        devs = _jax.devices()[: args.sp_devices]
        models.sp_mesh = Mesh(_np.array(devs), ("sp",))
        models.sp_threshold = args.sp_threshold

    if args.tp_devices:
        from asr2pass_tpu.parallel.sharding import make_mesh

        # all tp_devices on the tp axis (dp=1): pass-2 params shard
        # Megatron-style; any serving batch size stays valid
        models.tp_mesh = make_mesh(n_devices=args.tp_devices,
                                   tp=args.tp_devices)

    ssl_ctx = None
    if args.certfile:
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(args.certfile, args.keyfile or None)

    from asr2pass_tpu.server.ws_server import AsrWsServer

    AsrWsServer(models, host=args.host, port=args.port,
                decode_workers=args.decode_workers,
                ssl_context=ssl_ctx, use_engine=args.engine,
                engine_capacity=args.engine_capacity,
                upload_overlap=args.upload_overlap,
                decide_async=args.decide_async,
                max_message_bytes=args.max_message_mb << 20,
                max_upload_bytes=args.max_upload_mb << 20).run_forever()


if __name__ == "__main__":
    main()
