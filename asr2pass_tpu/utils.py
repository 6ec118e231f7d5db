"""Small shared utilities."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast float leaves of a pytree (params) to `dtype`; non-floats pass
    through. Used to run the serving path in bfloat16 on the MXU."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def force_cpu():
    """Select the CPU backend even under the axon site hook (which calls
    jax.config.update('jax_platforms', 'axon,cpu') at interpreter start)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def quantize_params(tree, weight_only: bool = False):
    """Per-output-channel int8 weight quantization of every dense layer
    ({"w"[,"b"]} dicts). Stacked [L, in, out] weights quantize per
    [L, out]. LayerNorm/embedding/conv leaves stay float.

    weight_only=False stores "w_q": layers.dense runs the int8 MXU path
    with dynamic per-row activation quantization (w8a8). weight_only=True
    stores "w_q8": weights live in HBM as int8 (half of bf16 traffic) and
    are dequantized on the fly into the bf16 MXU path (w8a16) — no
    activation-quant VPU overhead, activations stay bf16."""
    import jax.numpy as jnp

    key = "w_q8" if weight_only else "w_q"

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in ("conv", "us_conv", "embed"):
                return node  # convs/embeddings keep float weights
            if ("w" in node and hasattr(node["w"], "ndim")
                    and node["w"].ndim in (2, 3) and "taps" not in node):
                w = node["w"]
                scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
                scale = jnp.maximum(scale, 1e-12)
                w_q = jnp.clip(jnp.round(w / scale), -127, 127
                               ).astype(jnp.int8)
                out = {key: w_q, "scale": jnp.squeeze(scale, axis=-2)}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v, name) for v in node]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return node

    return walk(tree)
