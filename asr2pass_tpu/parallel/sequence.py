"""Sequence-parallel SAN-M encoding for very long offline segments.

The reference bounds sequence length by VAD forced cuts (60 s offline max,
SURVEY §5 "long-context") — fine for speech, but hour-long recordings
benefit from larger windows. This module shards the TIME axis of one
segment across the mesh's devices with `shard_map`:

  * dense/FFN/LayerNorm are pointwise over time — free under sharding
  * attention: q stays local, k/v are all-gathered over the sequence axis
    (memory O(T·D) per device, fine to tens of thousands of frames)
  * the FSMN memory conv needs (kernel-1)/2 frames of halo on each side —
    exchanged with `ppermute` between ring neighbors

Parity with the single-device encoder is tested on the 8-device CPU mesh.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr2pass_tpu.config import EncoderConfig
from asr2pass_tpu.models.layers import (
    _merge_heads,
    _split_heads,
    dense,
    layer_norm,
    sinusoidal_posenc,
)


def _halo_exchange(x, halo: int, axis: str):
    """Append `halo` frames from each ring neighbor: [B, t, D] ->
    [B, halo + t + halo, D] (zero at the sequence ends)."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    right_edge = x[:, -halo:, :]   # send to right neighbor (their left halo)
    left_edge = x[:, :halo, :]     # send to left neighbor (their right halo)
    from_left = jax.lax.ppermute(
        right_edge, axis, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis, [(i, (i - 1) % n) for i in range(n)])
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _fsmn_halo(p, x, axis: str):
    """Centered depthwise memory conv with cross-shard halos."""
    kernel = p["taps"].shape[0]
    left = (kernel - 1) // 2
    taps = p["taps"].astype(x.dtype)
    ext = _halo_exchange(x, left, axis)
    t = x.shape[1]
    out = jnp.zeros_like(x)
    for k in range(kernel):
        out = out + ext[:, k: k + t, :] * taps[k]
    return x + out


def _attention_sp(p, x, heads: int, axis: str, mask=None):
    """Self-attention with local q, all-gathered k/v. mask: local [B, t]
    (1 = valid) — all-gathered for the score mask, applied locally to v
    before the FSMN conv (fsmn_apply semantics)."""
    qkv = dense(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if mask is not None:
        v = v * mask[..., None].astype(v.dtype)
    mem = _fsmn_halo(p["fsmn"], v, axis)
    kg = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    d_k = q.shape[-1] // heads
    qh = _split_heads(q, heads)
    kh = _split_heads(kg, heads)
    vh = _split_heads(vg, heads)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        gmask = jax.lax.all_gather(mask, axis, axis=1, tiled=True)
        scores = jnp.where(gmask[:, None, None, :] > 0, scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", att, vh)
    return dense(p["out"], _merge_heads(ctx)) + mem


def _block_sp(layer, x, heads, residual, axis, mask=None):
    from asr2pass_tpu.models.layers import ffn

    h = _attention_sp(layer["att"], layer_norm(layer["ln1"], x), heads,
                      axis, mask)
    x = x + h if residual else h
    x = x + ffn(layer["ffn"], layer_norm(layer["ln2"], x))
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    return x


def encode_sequence_parallel(params, feats, cfg: EncoderConfig, mesh: Mesh,
                             axis: str = "dp", lengths=None):
    """[B, T, input_size] -> [B, T, d] with T sharded over `axis`.

    T must divide the axis size. lengths [B] enables right-padding masks
    (serving: long segments are padded up to a multiple of the axis)."""
    d_model = cfg.output_size
    heads = cfg.attention_heads
    t = feats.shape[1]
    n = mesh.shape[axis]
    assert t % n == 0, f"T={t} must divide axis size {n}"
    import numpy as np

    if lengths is None:
        lengths = np.full((feats.shape[0],), t, np.int32)
    mask_full = (np.arange(t)[None, :]
                 < np.asarray(lengths)[:, None]).astype(np.float32)

    def fn(params, x, mask):
        idx = jax.lax.axis_index(axis)
        local_t = x.shape[1]
        # absolute positions for this shard
        pe = sinusoidal_posenc(0, t, x.shape[-1])
        pe_local = jax.lax.dynamic_slice_in_dim(pe, idx * local_t, local_t,
                                                axis=0)
        h = x * jnp.asarray(math.sqrt(d_model), x.dtype) + \
            pe_local[None].astype(x.dtype)
        h = _block_sp(params["first"], h, heads,
                      residual=(x.shape[-1] == d_model), axis=axis,
                      mask=mask)
        if params["rest"] is not None:
            nlayers = jax.tree.leaves(params["rest"])[0].shape[0]
            for i in range(nlayers):
                layer = jax.tree.map(lambda a: a[i], params["rest"])
                h = _block_sp(layer, h, heads, residual=True, axis=axis,
                              mask=mask)
        return layer_norm(params["after_norm"], h)

    from jax import shard_map as _sm

    # jit + program cache: an unjitted shard_map executes per-primitive
    # (measured ~14 s/call on the 8-device CPU mesh where the jitted
    # program runs in tens of ms) and a per-call trace would RECOMPILE on
    # every served SP segment — minutes each through a remote-compile
    # tunnel. The mask rides as an argument, so only (cfg, mesh, axis,
    # shapes) key the cache.
    key = (cfg, mesh, axis, tuple(feats.shape))
    prog = _SP_PROGRAMS.get(key)
    if prog is None:
        prog = jax.jit(_sm(fn, mesh=mesh,
                           in_specs=(P(), P(None, axis, None),
                                     P(None, axis)),
                           out_specs=P(None, axis, None)))
        _SP_PROGRAMS[key] = prog
    feats = jax.device_put(feats, NamedSharding(mesh, P(None, axis, None)))
    mask_full = jax.device_put(
        mask_full, NamedSharding(mesh, P(None, axis)))
    return prog(params, feats, mask_full)


_SP_PROGRAMS: dict = {}
