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
