"""Device mesh + parameter sharding rules (TP × stream-DP).

The reference is single-node multi-threaded with no collectives
(SURVEY.md §2.5); the TPU-native scaling model replaces it:
  * dp axis — concurrent utterance streams / batch elements, data parallel
  * tp axis — Megatron-style tensor parallel over the pass-2 model when it
    exceeds one chip's HBM: attention qkv and FFN w1 are column-parallel,
    their successors (out, w2) row-parallel; GSPMD inserts the psum /
    all-gather collectives over ICI from these annotations alone.

Rules are matched on param-path names, so every model family here
(Paraformer en/decoder, SenseVoice, CT-Transformer, VAD) shards with the
same function.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              devices=None) -> Mesh:
    """Factor available devices into a ("dp", "tp") mesh. tp rides the
    faster (inner) axis so its collectives stay on ICI."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


# param-path suffix -> PartitionSpec
_COL = ("qkv/w", "kv/w", "q/w", "w1/w", "out/w@head", "proj/w", "wx/w")
_ROW = ("att/out/w", "cross/out/w", "w2/w", "affine/w", "wh/w")


def _spec_for(path: str, ndim: int) -> P:
    """Sharding rule by parameter path. Stacked layer pytrees
    (.../rest/... or .../blocks/...) carry a leading layer axis: the rule
    applies to the trailing dims and the layer axis stays unsharded."""
    stacked = "/rest/" in path or "/blocks/" in path
    if stacked and ndim >= 1:
        inner = _spec_for(path.replace("/rest/", "/L/")
                          .replace("/blocks/", "/L/"), ndim - 1)
        return P(*((None,) + tuple(inner)))
    if ndim < 2:
        # biases of column-parallel layers follow their output shard
        if path.endswith(("qkv/b", "kv/b", "q/b", "w1/b", "proj/b", "wx/b")):
            return P("tp")
        return P()
    # vocab head + embeddings: shard the vocab/feature dim
    if path.endswith(("decoder/out/w", "ctc/w")):
        return P(None, "tp")
    if path.endswith("embed/table") or path.endswith("_embed"):
        return P(None, "tp")
    for suffix in _ROW:
        if path.endswith(suffix):
            return P("tp", None)
    for suffix in _COL:
        if suffix.endswith("@head"):
            continue
        if path.endswith(suffix):
            return P(None, "tp")
    if path.endswith("fsmn/taps") or path.endswith("taps"):
        return P(None, "tp")  # follows the value shard
    if path.endswith("us_conv/w") or path.endswith("conv/w"):
        return P()            # small predictor convs: replicate
    return P()


def _walk(tree: Any, prefix: str, fn):
    if isinstance(tree, dict):
        return {k: _walk(v, f"{prefix}/{k}" if prefix else k, fn)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        seq = [_walk(v, f"{prefix}/{i}", fn) for i, v in enumerate(tree)]
        return type(tree)(seq) if isinstance(tree, tuple) else seq
    return fn(prefix, tree)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings mirroring `params`."""
    return _walk(
        params, "",
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, np.ndim(leaf))),
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters onto the mesh per the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
