"""Checkpoint/resume for the solver state.

The reference has no serialization but its resumable ``build/propagate``
state machine is the natural hook (``src/lbfgs.rs:443-499``, SURVEY.md §5);
here the full ``SolverState`` is a pytree, so checkpointing is a flat
save/restore of its leaves.  Plain ``.npz`` by default (zero deps); orbax
works on the same pytree if richer management is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SolverState


def save_state(path: str, state: SolverState) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, like: SolverState) -> SolverState:
    """Load a checkpoint saved by ``save_state``; ``like`` provides the
    treedef (build a fresh state with the same config/shapes)."""
    _, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    return jax.tree.unflatten(treedef, leaves)
