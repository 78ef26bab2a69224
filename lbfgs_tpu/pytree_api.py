"""Pytree-parameter front end.

The reference optimizes flat ``[f64]`` slices; JAX users carry parameters
as pytrees (dicts/lists of arrays).  This front end ravels any pytree to
the solver's flat vector via ``jax.flatten_util.ravel_pytree`` and wraps a
scalar objective ``f(pytree) -> fx`` (gradient via ``jax.grad``) — every
solver feature (OWL-QN windows operate on the raveled index space,
sharding, batching) applies unchanged.

Example::

    params0 = {"w": jnp.zeros((4, 4)), "b": jnp.zeros(4)}
    def loss(p): ...
    report, final_params = minimize_pytree(loss, params0, lbfgs())
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.flatten_util import ravel_pytree

from .core import Report
from .params import Lbfgs, lbfgs as _lbfgs


def minimize_pytree(
    fun: Callable[[Any], Any],
    x0_pytree: Any,
    optimizer: Lbfgs | None = None,
    progress: Callable | None = None,
    jit_driver: bool = False,
) -> Tuple[Report, Any]:
    """Minimize a scalar function of a pytree; returns (Report, pytree).

    ``optimizer`` is a configured ``lbfgs()`` builder (defaults applied if
    omitted).  ``jit_driver=True`` uses the whole-run ``lax.while_loop``
    driver (no progress callback support there).
    """
    opt = optimizer or _lbfgs()
    flat0, unravel = ravel_pytree(x0_pytree)

    def flat_objective(x_flat):
        return fun(unravel(x_flat))

    vag = jax.value_and_grad(flat_objective)
    vag.__lbfgs_value_and_grad__ = True

    if jit_driver:
        report = opt.minimize_jit(flat0, vag)
    else:
        report = opt.minimize(flat0, vag, progress)
    return report, unravel(report.x)
