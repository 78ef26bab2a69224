"""Pallas fused kernels vs their jnp reference implementations.

Runs the kernels in interpreter mode on CPU (SURVEY.md §4's per-kernel
numeric-unit-test strategy); on a real TPU the same comparisons run
compiled (see bench/ and the TPU smoke script)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_tpu.ops import fused

pytestmark = pytest.mark.skipif(
    not fused.HAVE_PALLAS, reason="pallas unavailable"
)


def _rand(n, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n), jnp.float32)


@pytest.mark.parametrize("n", [100, 65536, 65536 + 17])
def test_trial_step_kernel_matches_ref(n):
    xp, d = _rand(n, 1), _rand(n, 2)
    wp = jnp.sign(_rand(n, 3))
    stp = 0.37
    start, end = 1, n - 1
    ref = fused.owlqn_trial_step_ref(xp, d, wp, stp, start, end)
    out = fused.owlqn_trial_step_pallas(xp, d, wp, stp, start, end, interpret=True)
    # in-kernel FMA rounds xp + stp*d differently on cancellation-prone
    # elements; zero-pattern (projection decisions) must match exactly
    np.testing.assert_array_equal(np.asarray(out) == 0, np.asarray(ref) == 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [100, 65536 + 17])
def test_pseudo_gradient_kernel_matches_ref(n):
    x = _rand(n, 4)
    x = x.at[::7].set(0.0)  # exercise the subgradient branch
    g = _rand(n, 5)
    c = 0.8
    start, end = 2, n
    ref = fused.owlqn_pseudo_gradient_ref(x, g, c, start, end)
    out = fused.owlqn_pseudo_gradient_pallas(x, g, c, start, end, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("n", [100, 65536 + 17])
def test_axpy_dot_kernel_matches_ref(n):
    y, x, w = _rand(n, 6), _rand(n, 7), _rand(n, 8)
    c = -0.45
    z_ref, d_ref = fused.axpy_dot_ref(y, x, c, w)
    z, d = fused.axpy_dot_pallas(y, x, c, w, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-5, atol=1e-6)
    assert float(d) == pytest.approx(float(d_ref), rel=1e-4)


def test_dispatch_falls_back_on_cpu_f64():
    """On CPU/f64 the maybe-wrappers must route to the jnp reference."""
    xp = jnp.asarray(np.random.RandomState(0).randn(64))
    d = jnp.zeros_like(xp)
    wp = jnp.sign(xp)
    out = fused.owlqn_trial_step(xp, d, wp, 0.1, 0, 64)
    ref = fused.owlqn_trial_step_ref(xp, d, wp, 0.1, 0, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
