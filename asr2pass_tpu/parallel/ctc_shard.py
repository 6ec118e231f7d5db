"""Device-side CTC beam first-prune, with collective candidate exchange
over a vocab-sharded (tensor-parallel) CTC head.

The host prefix beam (decode/ctc.py) only ever consumes the per-frame
top-k candidate set — the "beam state" each step starts from. Computing
that set ON DEVICE closes two gaps at once:

  * transfer: [B, T, k] ids+scores cross the tunnel instead of the full
    [B, T, V] logits (V ≈ 25k for SenseVoice → ~200x less)
  * the north-star sharded-decode clause (BASELINE config 5): when the
    CTC head is Megatron-sharded over the tp axis, each shard holds only
    its vocab slice, so the candidate set is assembled with collectives —
    global log-softmax via pmax/psum, local top-k per shard, all_gather
    of the shards' candidates over ICI, global re-top-k. That is beam
    state exchanged between chips during a sharded pass-2 decode.

Programs are cached by (shape, mesh, axis, k) — a fresh trace per served
segment would recompile through the remote-compile tunnel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=8)
def _prune_plain(k: int):
    @jax.jit
    def fn(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        scores, ids = jax.lax.top_k(logp, k)
        return ids, scores

    return fn


def ctc_first_prune(logits, k: int = 64):
    """[B, T, V] logits (device) -> (ids [B, T, k], logp [B, T, k]).
    Single-device form of the sharded prune below."""
    return _prune_plain(min(k, logits.shape[-1]))(logits)


@functools.lru_cache(maxsize=8)
def _prune_gather(k: int):
    @jax.jit
    def fn(logits, ids):
        logp = jax.nn.log_softmax(logits, axis=-1)
        scores, top = jax.lax.top_k(logp, k)
        return top, scores, jnp.take(logp, ids, axis=-1)

    return fn


def ctc_first_prune_gather(logits, ids, k: int = 64):
    """Fused first-prune + explicit-id gather: ONE log-softmax pass over
    [B, T, V] serves both the top-k candidate set and the force-included
    context-unit log-probs — a separate ctc_gather_logp dispatch would
    re-normalize the full logits tensor a second time (V≈25k at
    production vocab) just to read a handful of columns."""
    return _prune_gather(min(k, logits.shape[-1]))(
        logits, jnp.asarray(ids, jnp.int32))


@jax.jit
def ctc_gather_logp(logits, ids):
    """Globally-normalized log-probs of an EXPLICIT id set for every
    frame: [B, T, V] logits + [E] ids -> [B, T, E] logp.

    Serves the pruned-beam hotword guarantee: the context graph's unit
    ids are force-included into the beam's per-frame candidate set, so
    the device top-k prune can never hide a hotword token from the bias
    (the reference updates context on the FULL vocab beam,
    ctc-prefix-decoder.cpp:280-299). Works on tp-sharded logits too —
    GSPMD turns the take over the sharded vocab axis into the needed
    collective."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take(logp, ids, axis=-1)


_PROGRAMS: dict = {}


def ctc_first_prune_sharded(logits, mesh: Mesh, axis: str = "tp",
                            k: int = 64):
    """Vocab-sharded first-prune: logits [B, T, V] arrive (or are placed)
    sharded P(None, None, axis); every shard computes the globally
    normalized log-softmax (pmax + psum over `axis`), takes its local
    top-k, and the candidate sets are all_gathered and re-reduced to the
    global top-k — the beam-state exchange riding ICI collectives.
    Returns replicated (ids [B, T, k'], logp [B, T, k']) with
    k' = min(k, n * min(k, V/n)). Standard distributed-top-k caveat:
    each shard contributes at most min(k, V/n) candidates, so when
    V/n > k the set can miss a candidate if one shard holds more than k
    of the global top-k (vanishingly rare for softmax rows; exact
    whenever V/n <= k)."""
    n = mesh.shape[axis]
    key = (tuple(logits.shape), mesh, axis, k)
    prog = _PROGRAMS.get(key)
    if prog is None:
        vshard = logits.shape[-1] // n
        local_k = min(k, vshard)
        final_k = min(k, n * local_k)

        def fn(x):                      # x: [B, T, V/n] local slice
            m = jax.lax.pmax(jnp.max(x, axis=-1), axis)      # [B, T]
            z = jax.lax.psum(
                jnp.sum(jnp.exp(x - m[..., None]), axis=-1), axis)
            logp = x - m[..., None] - jnp.log(z)[..., None]
            sc, idx = jax.lax.top_k(logp, local_k)           # local top-k
            idx = idx + jax.lax.axis_index(axis) * vshard    # global ids
            # exchange candidate sets across shards, re-reduce
            sc_all = jax.lax.all_gather(sc, axis, axis=2, tiled=True)
            idx_all = jax.lax.all_gather(idx, axis, axis=2, tiled=True)
            sc2, pos = jax.lax.top_k(sc_all, final_k)
            ids = jnp.take_along_axis(idx_all, pos, axis=-1)
            return ids, sc2

        from jax import shard_map as _sm

        # replication of the post-all_gather top-k cannot be statically
        # inferred; it holds by construction (every shard reduces the
        # same gathered candidate set)
        prog = jax.jit(_sm(fn, mesh=mesh,
                           in_specs=P(None, None, axis),
                           out_specs=(P(), P()), check_vma=False))
        _PROGRAMS[key] = prog
    logits = jax.device_put(
        logits, NamedSharding(mesh, P(None, None, axis)))
    return prog(logits)
