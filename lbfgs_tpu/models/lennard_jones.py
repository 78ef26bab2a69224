"""Lennard-Jones cluster energy/gradient (geometry relaxation workload).

TPU-native re-design of the reference LJ example (``examples/lj.rs:3-129``):
the reference loops over atom pairs sequentially; here the full [N, N]
pairwise-distance matrix is computed at once (O(N^2) elementwise on the VPU,
reductions fused by XLA).  Positions are a flat [3N] vector so the solver
treats it like any parameter vector; gradient = -forces, as in the example's
``gx.vecscale(-1.0)``.

Pair potential (epsilon = sigma = 1 by default):
    v(r)  = 4 eps ((s/r)^12 - (s/r)^6)
    v'(r) = 24 eps ((s/r)^6 - 2 (s/r)^12) / r
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclasses.dataclass(frozen=True)
class LennardJones:
    epsilon: float = 1.0
    sigma: float = 1.0

    def value_and_grad(self, x: Array) -> tuple[Array, Array]:
        n = x.shape[0] // 3
        pos = x.reshape(n, 3)
        diff = pos[:, None, :] - pos[None, :, :]            # [N, N, 3]
        r2 = jnp.sum(diff * diff, axis=-1)                   # [N, N]
        eye = jnp.eye(n, dtype=bool)
        r2_safe = jnp.where(eye, 1.0, r2)
        inv_r2 = (self.sigma * self.sigma) / r2_safe
        s6 = inv_r2 ** 3
        s12 = s6 * s6
        pair_e = jnp.where(eye, 0.0, 4.0 * self.epsilon * (s12 - s6))
        energy = 0.5 * jnp.sum(pair_e)
        # dv/dr / r  (so force_ij = -(dv/dr)/r * diff_ij)
        dvdr_over_r = jnp.where(
            eye, 0.0, 24.0 * self.epsilon * (s6 - 2.0 * s12) / r2_safe
        )
        # gradient of energy wrt pos_i: sum_j (dv/dr)/r * (pos_i - pos_j)
        grad = jnp.sum(dvdr_over_r[:, :, None] * diff, axis=1)  # [N, 3]
        return energy, grad.reshape(-1)


def lj38_positions(dtype=jnp.float64) -> Array:
    """A 38-atom cluster start geometry equivalent in spirit to the
    reference example's LJ38 (``examples/lj.rs:70-109``): a deterministic
    perturbed fcc-like arrangement around (50, 50, 50)."""
    rng = np.random.RandomState(38)
    base = []
    # 3x3x3 grid + extras, spacing ~1.1, keep first 38
    for i in range(4):
        for j in range(4):
            for k in range(4):
                base.append([50.0 + 1.1 * i, 50.0 + 1.1 * j, 50.0 + 1.1 * k])
    pts = np.array(base[:38])
    pts += 0.05 * rng.randn(*pts.shape)
    return jnp.asarray(pts.reshape(-1), dtype)


def make_objective(epsilon: float = 1.0, sigma: float = 1.0):
    lj = LennardJones(epsilon, sigma)

    def vag(x):
        return lj.value_and_grad(x)

    vag.__lbfgs_value_and_grad__ = True
    return vag
