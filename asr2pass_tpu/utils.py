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
