"""Booth function (N = 2), global minimum at (1, 3).

Matches the reference integration test (``tests/simple.rs:57-83``):

    f = (x1 + 2*x2 - 7)^2 + (2*x1 + x2 - 5)^2
    g1 = 10*x1 + 8*x2 - 34;  g2 = 8*x1 + 10*x2 - 38
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def value_and_grad(x: Array) -> tuple[Array, Array]:
    x1, x2 = x[0], x[1]
    fx = (x1 + 2.0 * x2 - 7.0) ** 2 + (2.0 * x1 + x2 - 5.0) ** 2
    g1 = 10.0 * x1 + 8.0 * x2 - 34.0
    g2 = 8.0 * x1 + 10.0 * x2 - 38.0
    return fx, jnp.stack([g1, g2])


value_and_grad.__lbfgs_value_and_grad__ = True
