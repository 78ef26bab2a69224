"""TPU-backend smoke tests.

Skipped unless a TPU (or other accelerator) backend is active.  The
conftest forces CPU by default; opt out with:

    LBFGS_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

Kept small (one compile each) because remote compilation can be slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="accelerator backend not active"
)


def test_propagate_runs_on_tpu():
    from lbfgs_tpu.core import ProblemDef
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams
    from lbfgs_tpu.solver import init_state, propagate_hot, start_state

    n = 1 << 16
    pdef = ProblemDef(value_and_grad=rosenbrock.value_and_grad)
    params = LbfgsParams()
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    st = jax.jit(lambda x: start_state(init_state(pdef, params, x)))(x0)
    step = jax.jit(lambda s: propagate_hot(pdef, params, s))
    st = step(step(st))
    assert np.isfinite(float(st.prob.fx))
    assert int(st.k) == 3
    assert int(st.status) == 0


def test_pallas_kernels_compiled_match_reference():
    from lbfgs_tpu.ops import fused

    n = 1 << 16
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(n), jnp.float32)
    d = jnp.asarray(rng.randn(n), jnp.float32)
    wp = jnp.sign(jnp.asarray(rng.randn(n), jnp.float32))
    out = fused.owlqn_trial_step(xp, d, wp, 0.3, 1, n - 5)
    ref = fused.owlqn_trial_step_ref(xp, d, wp, 0.3, 1, n - 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_rosenbrock_trial_kernel_compiled_matches_reference():
    from lbfgs_tpu.models import rosenbrock

    n = 1 << 16
    rng = np.random.RandomState(1)
    xp = jnp.asarray(rng.randn(n), jnp.float32)
    d = jnp.asarray(rng.randn(n), jnp.float32)
    xt, fx, g, dg, *_ = rosenbrock.trial_pallas(xp, d, 0.21)
    xt_r, fx_r, g_r, dg_r, *_ = rosenbrock.trial_ref(xp, d, 0.21)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_r), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), rtol=1e-4, atol=1e-2)
    assert float(fx) == pytest.approx(float(fx_r), rel=1e-5)
    assert float(dg) == pytest.approx(float(dg_r), rel=1e-3, abs=1e-1)


def test_tail_masked_grid_compiled_matches_reference():
    """Compiled (non-interpret) check of the cdiv-grid tail masking: a
    lane-aligned n whose rows do not divide the block size relies on
    Mosaic dropping OOB writes and the kernels masking OOB reads out of
    their accumulators (the n=1e8 shape class)."""
    from lbfgs_tpu.models import rosenbrock

    n = 128 * 1001  # rows=1001: partial tail block at any block size
    rng = np.random.RandomState(2)
    xp = jnp.asarray(rng.randn(n), jnp.float32)
    d = jnp.asarray(rng.randn(n), jnp.float32)
    xt, fx, g, dg, gg, xx, ch = rosenbrock.trial_pallas(xp, d, 0.3)
    xt_r, fx_r, g_r, dg_r, gg_r, xx_r, ch_r = rosenbrock.trial_ref(xp, d, 0.3)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_r), rtol=1e-6, atol=1e-6)
    assert float(fx) == pytest.approx(float(fx_r), rel=1e-4)
    assert float(gg) == pytest.approx(float(gg_r), rel=1e-3)
    assert float(xx) == pytest.approx(float(xx_r), rel=1e-4)
    assert bool(ch) == bool(ch_r)
