"""Small pytree utilities used across the framework."""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def param_count(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def tree_bytes(tree: Any) -> int:
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))


def dtype_summary(tree: Any) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for l in jax.tree.leaves(tree):
        k = str(l.dtype)
        out[k] = out.get(k, 0) + int(np.prod(l.shape))
    return out


def finite_check(tree: Any) -> bool:
    """True iff every leaf is fully finite (failure-detection helper)."""
    import jax.numpy as jnp

    return all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))
