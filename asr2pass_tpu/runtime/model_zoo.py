"""Model artifacts: checkpoint save/load + model-directory convention.

The reference's artifact convention is a directory of
model[_quant].onnx / config.yaml / am.mvn / tokens.json (+ seg_dict,
TLG.fst, itn FSTs) auto-downloaded from ModelScope (com-define.h:52-88,
funasr-wss-server-2pass.cpp:195-502). Here the same directory layout holds
`weights.npz` (flattened param pytree) instead of ONNX graphs; config.yaml
and am.mvn/tokens.json parse identically, so converting a reference model
directory is a matter of exporting its weights into npz (tools/convert.py).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr2pass_tpu import config as cfg_mod
from asr2pass_tpu.frontend.audio import parse_kaldi_cmvn
from asr2pass_tpu.text.vocab import Vocab


# -- pytree <-> flat npz ----------------------------------------------------

def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}" if prefix else str(k), out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def save_params(path: str, params: Any):
    flat: Dict[str, np.ndarray] = {}
    _flatten(params, "", flat)
    np.savez(path, **flat)


def load_params(path: str) -> Any:
    """Rebuild the nested structure; integer keys become lists."""
    flat = dict(np.load(path))
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# -- model bundles ----------------------------------------------------------

@dataclass
class OfflineBundle:
    params: Any
    cfg: cfg_mod.ParaformerConfig
    vocab: Vocab
    cmvn: Tuple[Optional[np.ndarray], Optional[np.ndarray]]


def save_offline_bundle(path: str, params, cfg: cfg_mod.ParaformerConfig,
                        tokens, cmvn=None):
    os.makedirs(path, exist_ok=True)
    save_params(os.path.join(path, "weights.npz"), params)
    with open(os.path.join(path, "tokens.json"), "w", encoding="utf-8") as f:
        json.dump(list(tokens), f, ensure_ascii=False)
    with open(os.path.join(path, "config.yaml"), "w") as f:
        import yaml

        f.write(yaml.safe_dump({
            "frontend_conf": {
                "fs": cfg.frontend.fs,
                "window": cfg.frontend.window,
                "n_mels": cfg.frontend.n_mels,
                "frame_length": cfg.frontend.frame_length_ms,
                "frame_shift": cfg.frontend.frame_shift_ms,
                "lfr_m": cfg.frontend.lfr_m,
                "lfr_n": cfg.frontend.lfr_n,
            },
            "encoder_conf": {
                "output_size": cfg.encoder.output_size,
                "num_blocks": cfg.encoder.num_blocks,
                "attention_heads": cfg.encoder.attention_heads,
                "linear_units": cfg.encoder.linear_units,
                "kernel_size": cfg.encoder.kernel_size,
            },
            "decoder_conf": {
                "num_blocks": cfg.decoder.num_blocks,
                "attention_heads": cfg.decoder.attention_heads,
                "linear_units": cfg.decoder.linear_units,
                "kernel_size": cfg.decoder.kernel_size,
                # absent = in-repo causal convention; FunASR dirs always
                # carry sanm_shfit (centered window)
                **({} if cfg.decoder.sanm_shift is None
                   else {"sanm_shift": cfg.decoder.sanm_shift}),
            },
            "predictor_conf": {
                "threshold": cfg.predictor.threshold,
                "tail_threshold": cfg.predictor.tail_threshold,
                "smooth_factor": cfg.predictor.smooth_factor,
                "noise_threshold": cfg.predictor.noise_threshold,
                "use_timestamp": cfg.predictor.use_timestamp,
                "upsample_times": cfg.predictor.upsample_times,
                "smooth_factor2": cfg.predictor.smooth_factor2,
                "noise_threshold2": cfg.predictor.noise_threshold2,
            },
            "vocab_size": cfg.vocab_size,
            "lang": cfg.lang,
        }))
    if cmvn is not None and cmvn[0] is not None:
        from asr2pass_tpu.frontend.audio import write_kaldi_cmvn

        write_kaldi_cmvn(os.path.join(path, "am.mvn"), cmvn[0], cmvn[1])


def load_offline_bundle(path: str) -> OfflineBundle:
    cfg = cfg_mod.load_paraformer_yaml(os.path.join(path, "config.yaml"))
    params = load_params(os.path.join(path, "weights.npz"))
    vocab = Vocab.from_file(os.path.join(path, "tokens.json"), cfg.lang)
    mvn_path = os.path.join(path, "am.mvn")
    cmvn = (None, None)
    if os.path.exists(mvn_path):
        cmvn = parse_kaldi_cmvn(mvn_path)
    return OfflineBundle(params=params, cfg=cfg, vocab=vocab, cmvn=cmvn)


def load_punc_dir(path: str):
    """Punc model dir -> (params, PuncConfig, PuncTokenizer): weights +
    the dir's config.yaml dims/punc_list + tokens.json — the one loader
    run_server and tools/transcribe (and through it eval_cer) share, so
    every entry point honors the same yaml contract
    (ct-transformer.cpp's session ingredients)."""
    import yaml

    from asr2pass_tpu.text.punc_tokenizer import PuncTokenizer

    params = load_params(os.path.join(path, "weights.npz"))
    cfg = cfg_mod.PuncConfig()
    punc_list = None
    py = os.path.join(path, "config.yaml")
    if os.path.exists(py):
        with open(py) as f:
            node = yaml.safe_load(f) or {}
        cfg = cfg_mod.punc_cfg_from_node(node)
        punc_list = node.get("punc_list")
    kw = ({"punc_list": punc_list}
          if isinstance(punc_list, list) and punc_list else {})
    tokenizer = PuncTokenizer.from_file(
        os.path.join(path, "tokens.json"), **kw)
    return params, cfg, tokenizer


# -- SenseVoice (svs) bundle ------------------------------------------------

@dataclass
class SvsBundle:
    params: Any
    cfg: cfg_mod.SenseVoiceConfig
    vocab: Vocab
    cmvn: Tuple[Optional[np.ndarray], Optional[np.ndarray]]


def save_svs_bundle(path: str, params, cfg: cfg_mod.SenseVoiceConfig,
                    tokens, cmvn=None):
    """SenseVoice model dir: same weights.npz/tokens.json/am.mvn layout,
    with the encoder/meta-token fields of SenseVoiceConfig in config.yaml
    (the reference's MODEL_SVS dir, sensevoice-small.cpp:497-560)."""
    import yaml

    os.makedirs(path, exist_ok=True)
    save_params(os.path.join(path, "weights.npz"), params)
    with open(os.path.join(path, "tokens.json"), "w",
              encoding="utf-8") as f:
        json.dump(list(tokens), f, ensure_ascii=False)
    with open(os.path.join(path, "config.yaml"), "w") as f:
        f.write(yaml.safe_dump({
            "model": "SenseVoiceSmall",
            "frontend_conf": {
                "fs": cfg.frontend.fs,
                "window": cfg.frontend.window,
                "n_mels": cfg.frontend.n_mels,
                "frame_length": cfg.frontend.frame_length_ms,
                "frame_shift": cfg.frontend.frame_shift_ms,
                "lfr_m": cfg.frontend.lfr_m,
                "lfr_n": cfg.frontend.lfr_n,
            },
            "encoder_conf": {
                "output_size": cfg.encoder.output_size,
                "num_blocks": cfg.encoder.num_blocks,
                "attention_heads": cfg.encoder.attention_heads,
                "linear_units": cfg.encoder.linear_units,
                "kernel_size": cfg.encoder.kernel_size,
            },
            "vocab_size": cfg.vocab_size,
            "blank_id": cfg.blank_id,
            "lid_pairs": [list(p) for p in cfg.lid_pairs],
            "textnorm_pairs": [list(p) for p in cfg.textnorm_pairs],
            "lang": cfg.lang,
        }))
    if cmvn is not None and cmvn[0] is not None:
        from asr2pass_tpu.frontend.audio import write_kaldi_cmvn

        write_kaldi_cmvn(os.path.join(path, "am.mvn"), cmvn[0], cmvn[1])


def load_svs_yaml(path: str) -> cfg_mod.SenseVoiceConfig:
    import yaml

    with open(path) as f:
        node = yaml.safe_load(f) or {}
    fe = node.get("frontend_conf", {})
    frontend = cfg_mod.FrontendConfig(
        fs=fe.get("fs", 16000), window=fe.get("window", "hamming"),
        n_mels=fe.get("n_mels", 80),
        frame_length_ms=fe.get("frame_length", 25),
        frame_shift_ms=fe.get("frame_shift", 10),
        lfr_m=fe.get("lfr_m", 7), lfr_n=fe.get("lfr_n", 6))
    enc = node.get("encoder_conf", {})
    encoder = cfg_mod.EncoderConfig(
        input_size=frontend.n_mels * frontend.lfr_m,
        output_size=enc.get("output_size", 512),
        num_blocks=enc.get("num_blocks", 50),
        attention_heads=enc.get("attention_heads", 4),
        linear_units=enc.get("linear_units", 2048),
        kernel_size=enc.get("kernel_size", 11))
    kw = {}
    if node.get("lid_pairs"):
        kw["lid_pairs"] = tuple(tuple(p) for p in node["lid_pairs"])
    if node.get("textnorm_pairs"):
        kw["textnorm_pairs"] = tuple(tuple(p)
                                     for p in node["textnorm_pairs"])
    return cfg_mod.SenseVoiceConfig(
        frontend=frontend, encoder=encoder,
        vocab_size=node.get("vocab_size", 25055),
        blank_id=node.get("blank_id", 0),
        lang=node.get("lang", "zh"), **kw)


def load_svs_bundle(path: str) -> SvsBundle:
    cfg = load_svs_yaml(os.path.join(path, "config.yaml"))
    params = load_params(os.path.join(path, "weights.npz"))
    tok_path = os.path.join(path, "tokens.json")
    with open(tok_path, encoding="utf-8") as f:
        tokens = json.load(f)
    if len(tokens) != cfg.vocab_size:
        cfg = cfg_mod.SenseVoiceConfig(
            frontend=cfg.frontend, encoder=cfg.encoder,
            vocab_size=len(tokens), lid_pairs=cfg.lid_pairs,
            textnorm_pairs=cfg.textnorm_pairs, blank_id=cfg.blank_id,
            lang=cfg.lang)
    vocab = Vocab(tokens, cfg.lang)
    mvn_path = os.path.join(path, "am.mvn")
    cmvn = (None, None)
    if os.path.exists(mvn_path):
        cmvn = parse_kaldi_cmvn(mvn_path)
    return SvsBundle(params=params, cfg=cfg, vocab=vocab, cmvn=cmvn)
