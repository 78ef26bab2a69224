"""Failure-path semantics: line-search internal errors revert to the
previous point and surface as the reference's "x not changed" fatal error
in the same propagate (``src/line.rs:213-220`` + ``src/lbfgs.rs:646``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_tpu import LbfgsError, lbfgs
from lbfgs_tpu.native import minimize_native
from lbfgs_tpu.params import LbfgsParams


def linear_vag(x):
    """f(x) = sum(x): unbounded below; More-Thuente extrapolates to
    max_step and must fail with the max-step error, triggering the
    revert-then-fatal recovery chain."""
    return jnp.sum(x), jnp.ones_like(x)


linear_vag.__lbfgs_value_and_grad__ = True


def test_jax_linear_objective_fails_like_reference():
    with pytest.raises(LbfgsError, match="x not changed"):
        lbfgs().minimize(jnp.zeros(8), linear_vag)


def test_native_linear_objective_fails_like_reference():
    def linear(x, g):
        g[...] = 1.0
        return float(np.sum(x))

    with pytest.raises(LbfgsError, match="x not changed"):
        minimize_native(LbfgsParams(), np.zeros(8), linear)


def test_jit_driver_reports_fatal_status():
    with pytest.raises(LbfgsError, match="x not changed"):
        lbfgs().minimize_jit(jnp.zeros(8), linear_vag)


def test_g_not_changed_error():
    """Quadratic-with-constant-gradient pathology: y = g - gp = 0 after a
    successful step -> reference 'gx not changed' (src/lbfgs.rs:655)."""

    def const_grad(x):
        # gradient constant (and nonzero): fx decreases along -g forever,
        # but curvature information is degenerate
        return jnp.dot(x, jnp.ones_like(x)), jnp.full_like(x, 0.5)

    const_grad.__lbfgs_value_and_grad__ = True
    with pytest.raises(LbfgsError):
        lbfgs().with_max_iterations(50).minimize(jnp.ones(4), const_grad)
