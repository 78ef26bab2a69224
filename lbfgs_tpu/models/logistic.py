"""L1-regularizable log-linear (Poisson) regression objective.

The OWL-QN realistic workload matching the reference integration test
(``tests/owlqn.rs:24-46``), which optimizes over a [nrow, ncol] design
matrix X and count vector y:

    fx(beta) = -( sum(y * X beta - exp(X beta)) ) + 0.5 * prec * sum(beta^2)
    g(beta)  = -( X^T (y - exp(X beta)) ) + prec * beta

The matvecs run on the MXU; this is the model family where the FLOPs live
in the user objective rather than the solver.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def make_objective(X: Array, y: Array, prec: float = 0.0):
    def vag(beta: Array) -> tuple[Array, Array]:
        xbeta = jnp.matmul(X, beta, precision="highest")
        exp_xbeta = jnp.exp(xbeta)
        fx = -jnp.sum(y * xbeta - exp_xbeta) + 0.5 * prec * jnp.sum(beta * beta)
        g = -jnp.matmul(X.T, y - exp_xbeta, precision="highest") + prec * beta
        return fx, g

    vag.__lbfgs_value_and_grad__ = True
    return vag


def synthetic_dataset(nrow: int = 500, ncol: int = 21, seed: int = 7, dtype=jnp.float64):
    """Deterministic synthetic Poisson-regression dataset with an intercept
    column, shaped like the reference's tests/x.csv (500x21)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    X = rng.randn(nrow, ncol)
    X[:, 0] = 1.0  # intercept
    beta_true = np.zeros(ncol)
    beta_true[0] = 0.3
    beta_true[1:6] = np.array([0.4, -0.3, 0.2, 0.0, -0.2])
    lam = np.exp(np.clip(X @ beta_true, -10, 10))
    y = rng.poisson(lam).astype(float)
    return jnp.asarray(X, dtype), jnp.asarray(y, dtype)
