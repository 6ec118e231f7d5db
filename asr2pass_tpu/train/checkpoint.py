"""Training checkpoint save/restore (params + optimizer state + step).

The reference has no checkpointing (inference only, SURVEY.md §5); the
fine-tune path needs resumable state. Format: the model_zoo npz flattening
for params and opt state, plus a small json sidecar.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

from asr2pass_tpu.runtime.model_zoo import load_params, save_params


def save_checkpoint(path: str, params: Any, opt_state: Any, step: int,
                    extra: Optional[dict] = None):
    os.makedirs(path, exist_ok=True)
    save_params(os.path.join(path, "params.npz"), params)
    save_params(os.path.join(path, "opt_state.npz"),
                _optstate_to_tree(opt_state))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, **(extra or {})}, f)


def restore_checkpoint(path: str, optimizer=None, params_template=None
                       ) -> Tuple[Any, Any, int]:
    """Returns (params, opt_state, step). opt_state is rebuilt by
    re-initializing the optimizer and loading leaf values into it (leaf
    order is deterministic for optax chains)."""
    import jax

    params = load_params(os.path.join(path, "params.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        step = json.load(f)["step"]
    opt_state = None
    opt_path = os.path.join(path, "opt_state.npz")
    if optimizer is not None and os.path.exists(opt_path):
        flat_tree = load_params(opt_path)
        fresh = optimizer.init(params)
        fresh_leaves, treedef = jax.tree.flatten(fresh)
        loaded_leaves = jax.tree.leaves(flat_tree)
        assert len(fresh_leaves) == len(loaded_leaves), \
            "optimizer structure changed since checkpoint"
        opt_state = jax.tree.unflatten(treedef, loaded_leaves)
    return params, opt_state, step


def _optstate_to_tree(opt_state: Any) -> dict:
    """Flatten an optax state (tuple of NamedTuples) into a plain dict for
    npz storage; leaf order is canonical."""
    import jax

    leaves = jax.tree.leaves(opt_state)
    return {f"leaf_{i:05d}": l for i, l in enumerate(leaves)}
