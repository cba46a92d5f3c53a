"""Parameter-tree diagnostics (ref utils/training.py:35-69).

``count_parameters`` splits embedding vs non-embedding parameters by
path substring, matching the reference's startup log
(``train_accel_gpu.py:73-74``); ``global_norm`` is the L2 norm used for
the per-step ``param_norm``/``grad_norm`` logs.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def count_parameters(params: Any) -> Tuple[int, int]:
    """(embedding_params, non_embedding_params) by path name."""
    n_emb = 0
    n_non = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path).lower()
        if "embedding" in name or "pos_embedding" in name:
            n_emb += leaf.size
        else:
            n_non += leaf.size
    return n_emb, n_non


def global_norm(tree: Any) -> jax.Array:
    """Global L2 norm over every leaf of a pytree."""
    leaves = [
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree.leaves(tree)
    ]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.float32(0.0)
