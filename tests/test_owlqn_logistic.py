"""OWL-QN L1-regularized log-linear regression — the reference's realistic
workload (``tests/owlqn.rs:5-63``), plus a synthetic fallback so the test
runs without the reference checkout."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_tpu import lbfgs
from lbfgs_tpu.models import logistic
from lbfgs_tpu.utils.csvio import read_r_csv

REF_DIR = "/root/reference/tests"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "x.csv")),
    reason="reference CSV fixtures not available",
)
def test_owlqn_logistic_reference_golden():
    """Golden fx = -42724.136705 at relative 1e-6 (tests/owlqn.rs:60)."""
    X = read_r_csv(os.path.join(REF_DIR, "x.csv"))
    y = read_r_csv(os.path.join(REF_DIR, "y.csv")).ravel()
    assert X.shape == (500, 21) and y.shape == (500,)
    obj = logistic.make_objective(jnp.asarray(X), jnp.asarray(y))
    rep = (
        lbfgs()
        .with_orthantwise(1.0, 1, 21)  # intercept excluded from L1 window
        .with_epsilon(1e-4)
        .minimize(jnp.zeros(21), obj)
    )
    golden = -42724.136705
    assert abs(rep.fx - golden) <= 1e-6 * abs(golden)
    assert rep.niter <= 250  # reference converges in well under this


def test_owlqn_logistic_on_device_generated():
    """The at-scale bench path (bench_logistic.py) at small size: X and y
    generated on device inside jit, X passed to the jitted run as an
    ARGUMENT (relay constraint: closure constants blow the HTTP body
    limit at multi-GB scale), OWL-QN over the same objective family,
    with the bf16-X storage variant landing near the f32 one."""
    import jax

    from lbfgs_tpu.core import ProblemDef
    from lbfgs_tpu.minimize import _run_while
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams, LineSearchAlgorithm
    from lbfgs_tpu.solver import init_state

    nrow, ncol = 512, 64
    ow = Orthantwise(c=5.0, start=1, end=ncol)
    params = LbfgsParams(
        max_iterations=20, epsilon=1e-3, orthantwise=ow
    ).replace_ls(algorithm=LineSearchAlgorithm.BacktrackingArmijo)

    def run_with(x_dtype):
        X, y = logistic.synthetic_device(
            nrow, ncol, seed=0, dtype=jnp.float32, x_dtype=x_dtype, nnz=8
        )

        @jax.jit
        def run(X, y, x0):
            pdef = ProblemDef(
                value_and_grad=logistic.make_objective(X, y, precision=None),
                owlqn=ow,
            )
            return _run_while(
                pdef, params, init_state(pdef, params, x0, lean=True)
            )

        return run(X, y, jnp.zeros((ncol,), jnp.float32))

    st32 = run_with(jnp.float32)
    beta = np.asarray(st32.prob.x)
    assert int(st32.status) in (1, 2, 3)
    assert beta[0] != 0.0                      # intercept survives
    assert np.sum(beta[1:] == 0.0) >= 1        # L1 zeros present
    # descends to the basin (fx ~ 243.2 at this seed)
    assert float(st32.prob.fx) < 260.0

    st16 = run_with(jnp.bfloat16)
    fx32, fx16 = float(st32.prob.fx), float(st16.prob.fx)
    assert np.isfinite(fx16)
    assert abs(fx16 - fx32) <= 2e-2 * abs(fx32)


def test_owlqn_logistic_f32_floor_vs_wide_fx():
    """The f32 objective-resolution floor on the reference's real OWL-QN
    workload, and the wide-fx fix (VERDICT round-3 missing #1 at small
    scale): in f32, once fx reaches the f32-ULP plateau the Armijo
    ladders exhaust and the run dies with a fatal not-changed error
    (observed: k=27 at this seed); with ``fx_wide`` the same
    configuration sustains resolvable progress through the full
    60-iteration budget (no fatal status) and ends at a STRICTLY lower
    fx — a sub-f32-ULP decrease only the f64 objective carry can see.
    The remaining boundary is the f32 VECTOR floor (gradient deltas
    rounding to zero), which no scalar carry can lift — documented in
    PERF.md."""
    from lbfgs_tpu.minimize import LbfgsState
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams, LineSearchAlgorithm
    from lbfgs_tpu.status import LbfgsError

    nrow, ncol = 512, 64
    ow = Orthantwise(c=5.0, start=1, end=ncol)
    X, y = logistic.synthetic_device(
        nrow, ncol, seed=0, dtype=jnp.float32, x_dtype=jnp.float32, nnz=8
    )

    def run(wide):
        params = LbfgsParams(
            max_iterations=60, epsilon=1e-4, orthantwise=ow, fx_wide=wide
        ).replace_ls(algorithm=LineSearchAlgorithm.BacktrackingArmijo)
        st = LbfgsState.build(
            params, jnp.zeros((ncol,), jnp.float32),
            logistic.make_objective(X, y, precision=None),
        )
        err = None
        try:
            while not st.is_converged():
                st.propagate()
        except LbfgsError as e:
            err = e
        return st, err

    st_d, err_d = run(False)
    st_w, err_w = run(True)
    # f32: fatal stall well before the budget
    assert err_d is not None
    assert int(st_d.state.k) < 40
    # wide: completes the budget, fx carried f64, strictly below the
    # f32 plateau value
    assert err_w is None
    assert int(st_w.state.k) == 60
    assert st_w.state.prob.fx.dtype == jnp.float64
    fx_d, fx_w = float(st_d.state.prob.fx), float(st_w.state.prob.fx)
    assert fx_w < fx_d
    # the winning margin is SUB-f32-ULP at this magnitude: invisible to
    # the f32 carry by construction
    assert 0.0 < fx_d - fx_w < float(np.spacing(np.float32(fx_d)))


def test_owlqn_logistic_synthetic():
    """Synthetic dataset: OWL-QN must (a) converge, (b) produce sparse
    coefficients relative to the unregularized fit, (c) beat the
    unregularized objective once the L1 term is included."""
    X, y = logistic.synthetic_dataset(nrow=300, ncol=11, seed=3)
    obj = logistic.make_objective(X, y)
    rep = (
        lbfgs()
        .with_orthantwise(30.0, 1, 11)
        .with_epsilon(1e-4)
        .minimize(jnp.zeros(11), obj)
    )
    assert rep.status in (1, 2, 3)  # converged (or hit a cap, not fatal)
    beta = np.asarray(rep.x)
    # L1 window coefficients: some exactly zero (sparsity)
    assert np.sum(beta[1:] == 0.0) >= 1
    # intercept not regularized away
    assert beta[0] != 0.0
