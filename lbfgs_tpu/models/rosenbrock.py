"""Extended Rosenbrock objective (the reference's default/benchmark problem).

Per-pair form with a = 1, b = 10 (squared inside), exactly matching the
reference ``default_evaluate`` (``src/lib.rs:79-94``; also
``examples/sample.rs:26-41`` and ``benches/rosenbrock.rs:16-29``):

    for even i:  t1 = 1 - x_i;  t2 = 10*(x_{i+1} - x_i^2)
                 g_{i+1} = 20*t2;  g_i = -2*(x_i*g_{i+1} + t1)
                 fx += t1^2 + t2^2

Fully vectorized over pairs: on a sharded vector the gradient is
shard-local elementwise work and fx is one reduction.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def value_and_grad(x: Array) -> tuple[Array, Array]:
    xe = x[0::2]
    xo = x[1::2]
    t1 = 1.0 - xe
    t2 = 10.0 * (xo - xe * xe)
    go = 20.0 * t2
    ge = -2.0 * (xe * go + t1)
    fx = jnp.sum(t1 * t1 + t2 * t2)
    g = jnp.stack([ge, go], axis=1).reshape(x.shape)
    return fx, g


value_and_grad.__lbfgs_value_and_grad__ = True


def initial_point(n: int, dtype=jnp.float64) -> Array:
    """x0 alternating (-1.2, 1.0) (``examples/sample.rs:13-17``)."""
    x = jnp.zeros((n,), dtype)
    x = x.at[0::2].set(-1.2)
    x = x.at[1::2].set(1.0)
    return x
