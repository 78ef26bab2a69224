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
    """TPU-friendly evaluation: instead of even/odd strided gathers and a
    stack/reshape interleave (lane-shuffle-heavy on TPU), compute on the
    full vector with one left/right rotate and a parity mask — pure
    elementwise VPU work plus one reduction.  At every even position i the
    pair (x_i, x_{i+1}) is visible as (x, roll(x, -1)); gradient values
    for odd positions are produced at the even position and rotated into
    place."""
    n = x.shape[0]
    if n % 2:
        # the pair form is defined for even n only; the reference panics on
        # odd n (index out of bounds in the pair loop) — fail loudly too
        raise ValueError(f"extended Rosenbrock requires even n, got {n}")
    even = (jnp.arange(n) % 2) == 0
    x_next = jnp.roll(x, -1)  # x_{i+1} at position i (valid at even i)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2              # g_{i+1}, computed at even position i
    ge = -2.0 * (x * go + t1)   # g_i, at even position i
    fx = jnp.sum(jnp.where(even, t1 * t1 + t2 * t2, 0.0))
    g = jnp.where(even, ge, jnp.roll(go, 1))
    return fx, g


value_and_grad.__lbfgs_value_and_grad__ = True


def initial_point(n: int, dtype=jnp.float64) -> Array:
    """x0 alternating (-1.2, 1.0) (``examples/sample.rs:13-17``)."""
    x = jnp.zeros((n,), dtype)
    x = x.at[0::2].set(-1.2)
    x = x.at[1::2].set(1.0)
    return x
