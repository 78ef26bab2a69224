"""TPU-backend smoke tests.

Skipped unless a TPU (or other accelerator) backend is active — run with
the default environment (not the CPU-forcing conftest env) as:

    python -m pytest tests/test_tpu_smoke.py -q --no-header -p no:cacheprovider

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
