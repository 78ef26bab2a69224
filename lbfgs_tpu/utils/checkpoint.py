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
    payload = {}
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        if a.dtype.kind not in "fiub":
            # ml_dtypes extension dtype (bfloat16/float8 history): np.savez
            # would store it as opaque void bytes that cannot round-trip —
            # bitcast to a same-width unsigned int and record the real
            # dtype name for load_state to bitcast back
            payload[f"dtype_{i}"] = np.asarray(a.dtype.name)
            a = a.view(f"u{a.dtype.itemsize}")
        payload[f"leaf_{i}"] = a
    np.savez(path, **payload)


def load_state(path: str, like: SolverState) -> SolverState:
    """Load a checkpoint saved by ``save_state``; ``like`` provides the
    treedef (build a fresh state with the same solver config — m, n,
    OWL-QN, fx-delta — via ``init_state``/``LbfgsState.build``).

    **Device-count portability:** the (s, y) history storage layout
    depends on the runtime device count (``core.hist_store_shape``:
    ring-major ``[m, n/128, 128]`` only when the row axis divides over
    the devices, else flat ``[m, n]``).  Both layouts hold the same
    elements in the same row-major order, so a checkpoint saved under
    one device configuration is canonicalized here by reshape to the
    template's layout — and cast to its dtype (e.g. a ``bfloat16``
    history restored into an ``f32`` config).  A leaf whose element
    COUNT differs from the template's is a real config mismatch (m or n
    changed) and raises instead of silently mis-restoring.
    """
    import ml_dtypes  # noqa: F401 - registers bfloat16/float8 with numpy

    tlike, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        nleaves = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = []
        for i in range(nleaves):
            a = np.asarray(data[f"leaf_{i}"])
            if f"dtype_{i}" in data.files:
                a = a.view(np.dtype(str(data[f"dtype_{i}"])))
            leaves.append(a)
    if len(leaves) != len(tlike):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but the template state has "
            f"{len(tlike)} — built with a different solver configuration?"
        )
    out = []
    for i, (saved, tmpl) in enumerate(zip(leaves, tlike)):
        if saved.shape != tmpl.shape:
            if saved.size != np.prod(tmpl.shape, dtype=np.int64):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {saved.shape} but the "
                    f"template expects {tmpl.shape} (different element count: "
                    "m/n/config mismatch)"
                )
            saved = saved.reshape(tmpl.shape)
        out.append(jnp.asarray(saved, dtype=tmpl.dtype))
    return jax.tree.unflatten(treedef, out)
