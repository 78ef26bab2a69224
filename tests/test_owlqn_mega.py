"""OWL-QN one-kernel epilogue (``__lbfgs_owlqn_trial_pair_gram__``).

The fused pass replaces FOUR composed vector passes of the OWL-QN
accept path — projected-trial materialize, pseudo-gradient(+norm), xg
pair+Gram, and the orthant recompute — with one kernel whose x/g/pg
outputs land in place over the carry buffers (PERF.md round 4: the
fresh-output versions forced XLA while-carry stabilization copies).

Pinned here: kernel vs the composed jnp oracle, end-to-end trajectory
equality against the kernel-free path, engagement spying, and the mesh
(shard_map) variant.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lbfgs_tpu.ops import fused
from lbfgs_tpu.models import rosenbrock

pytestmark = pytest.mark.skipif(not fused.HAVE_PALLAS, reason="pallas unavailable")


def _ring_major(H):
    m, n = H.shape
    return H.reshape(m, n // fused.LANES, fused.LANES)


@pytest.mark.parametrize("end", [0, 3])
@pytest.mark.parametrize("stp", [0.7, 0.0])
def test_owlqn_mega_matches_composed_oracle(end, stp):
    """Kernel == choose_orthant + projected trial + objective + pseudo-
    gradient + xg pair/Gram, composed (including the stp=0 zero-trip
    materialize, which must reproduce the entry point)."""
    m, n = 6, 4096
    rng = np.random.RandomState(7)
    xp = jnp.asarray(rng.randn(n) * 0.5, jnp.float32)
    xp = xp.at[::17].set(0.0)  # exercise the at-zero orthant choice
    d = jnp.asarray(rng.randn(n) * 0.05, jnp.float32)
    gp = jnp.asarray(rng.randn(n), jnp.float32)
    pg = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    Y = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    c, lo, hi = 1.0, 3, n - 5

    out_k = rosenbrock.owlqn_trial_pair_gram_pallas(
        xp, d, gp, pg, jnp.float32(stp), c, lo, hi,
        _ring_major(S), _ring_major(Y), end, interpret=True,
    )
    out_r = rosenbrock.owlqn_trial_pair_gram_ref(
        xp, d, gp, pg, jnp.float32(stp), c, lo, hi, S, Y, end
    )
    x_k, g_k, pg_k, S_k, Y_k, SP_k, YP_k, xx_k, pgpg_k, ch_k = out_k
    x_r, g_r, pg_r, S_r, Y_r, SP_r, YP_r, xx_r, pgpg_r, ch_r = out_r
    # tolerance-level (FMA contraction differs between the traced kernel
    # and the eager composition — same contract as test_pallas_fused);
    # the projection ZERO pattern must agree exactly
    np.testing.assert_array_equal(np.asarray(x_k) == 0, np.asarray(x_r) == 0)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pg_k), np.asarray(pg_r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(S_k).reshape(m, n),
                               np.asarray(S_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Y_k).reshape(m, n),
                               np.asarray(Y_r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(SP_k), np.asarray(SP_r),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP_k), np.asarray(YP_r),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(float(xx_k), float(xx_r), rtol=1e-5)
    np.testing.assert_allclose(float(pgpg_k), float(pgpg_r), rtol=1e-5)
    assert bool(ch_k) == bool(ch_r)
    if stp == 0.0:
        # zero-trip materialize reproduces the entry point exactly
        np.testing.assert_array_equal(np.asarray(x_k), np.asarray(xp))
        assert not bool(ch_k)


def test_epilogue_grid_short_grid_shrink():
    """The many-operand epilogue kernels exceed Mosaic's 16 MB scoped
    VMEM at short grids (measured: n=2^20 at 768-row blocks rejects with
    16.68 MB on the v5e); epilogue_grid shrinks the block until the grid
    has >= 24 steps while leaving the tuned at-scale config untouched."""
    # at-scale configs keep the tuned HIST_BLOCK_ROWS blocks
    nb, br = fused.epilogue_grid(1 << 24)
    assert br == fused.HIST_BLOCK_ROWS and nb >= 24
    nb, br = fused.epilogue_grid(100_000_000)
    assert br == fused.HIST_BLOCK_ROWS
    # the n=2^20 entry config (the compile-rejection case) shrinks
    nb, br = fused.epilogue_grid(1 << 20)
    assert br < fused.HIST_BLOCK_ROWS
    assert nb >= 24 or br <= 2 * fused.SUBLANES
    assert br % fused.SUBLANES == 0
    # SINGLE-block grids stay untouched (one block set is VMEM-safe, and
    # changing their partition would shift f32 accumulation grouping —
    # it diverged the 30-iteration damped trajectory pin when it did)
    nb, br = fused.epilogue_grid(fused.MIN_FUSED_N)
    assert (nb, br) == fused.kernel_grid(fused.MIN_FUSED_N,
                                         fused.HIST_BLOCK_ROWS)
    assert nb == 1
    nb, br = fused.epilogue_grid(128 * 41)
    assert nb == 1 and br % fused.SUBLANES == 0


def test_owlqn_probe_pg_bitwise_equals_wp_probe():
    """The pg-orthant probe must reproduce the wp-operand probe's scalars
    BIT-FOR-BIT (the remat/ladder contract): wp computed in-register from
    (xp, pg) is the same formula choose_orthant materializes."""
    from lbfgs_tpu import orthantwise as ow_ops
    from lbfgs_tpu.orthantwise import Orthantwise

    n = 4096
    rng = np.random.RandomState(11)
    xp = jnp.asarray(rng.randn(n) * 0.5, jnp.float32)
    xp = xp.at[::13].set(0.0)
    d = jnp.asarray(rng.randn(n) * 0.05, jnp.float32)
    pg = jnp.asarray(rng.randn(n), jnp.float32)
    c, lo, hi = 1.0, 2, n - 3
    wp = ow_ops.choose_orthant(Orthantwise(c=c, start=lo, end=hi), xp, pg)
    for stp in (1.0, 0.5, 0.0):
        ft_wp, dg_wp = rosenbrock.owlqn_probe_pallas(
            xp, d, wp, jnp.float32(stp), c, lo, hi, interpret=True
        )
        ft_pg, dg_pg = rosenbrock.owlqn_probe_pg_pallas(
            xp, d, pg, jnp.float32(stp), c, lo, hi, interpret=True
        )
        assert float(ft_wp) == float(ft_pg)
        assert float(dg_wp) == float(dg_pg)


def _run_owlqn(n, iters=25):
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams

    params = LbfgsParams(
        max_iterations=iters, epsilon=0.0,
        orthantwise=Orthantwise(c=1.0, start=0, end=n - 1),
    )
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    return minimize_jit(params, x0, rosenbrock.value_and_grad,
                        return_state=True)


def test_owlqn_mega_trajectory_and_engagement(monkeypatch):
    """Whole-run OWL-QN with interpret kernels: the mega epilogue must
    ENGAGE (spied) and its trajectory must track the kernel-free
    composed path at f32 tolerance with equal iteration counts."""
    monkeypatch.setenv("LBFGS_TPU_KERNELS_INTERPRET", "1")
    n = fused.MIN_FUSED_N

    engaged = []
    orig = rosenbrock.owlqn_trial_pair_gram_pallas

    def spy(*a, **k):
        engaged.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(rosenbrock.value_and_grad.kernels, "owlqn_trial_pair_gram_pallas", spy)
    st_k = _run_owlqn(n)
    assert engaged, "OWL-QN mega epilogue did not engage"

    monkeypatch.setenv("LBFGS_TPU_NO_PALLAS", "1")
    st_j = _run_owlqn(n)
    assert int(st_k.k) == int(st_j.k)
    assert int(st_k.prob.neval) == int(st_j.prob.neval)
    assert float(st_k.prob.fx) == pytest.approx(float(st_j.prob.fx), rel=1e-3)
    np.testing.assert_allclose(
        float(jnp.sqrt(st_k.prob.gnorm2)), float(jnp.sqrt(st_j.prob.gnorm2)),
        rtol=5e-2,
    )


@pytest.mark.parametrize("end", [0, 3])
def test_owlqn_mega_with_gp_matches_oracle(end):
    """The with_gp form: 4th (. gp) column plus the gp.gp / gp.pg_new
    scalars the damped reconstruction needs; columns 0-2 must equal the
    3-column form bitwise (append-only)."""
    m, n = 6, 4096
    rng = np.random.RandomState(17)
    xp = jnp.asarray(rng.randn(n) * 0.5, jnp.float32).at[::11].set(0.0)
    d = jnp.asarray(rng.randn(n) * 0.05, jnp.float32)
    gp = jnp.asarray(rng.randn(n), jnp.float32)
    pg = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    Y = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    c, lo, hi = 1.0, 0, n - 1
    args = (xp, d, gp, pg, jnp.float32(0.6), c, lo, hi)
    out3 = rosenbrock.owlqn_trial_pair_gram_pallas(
        *args, _ring_major(S), _ring_major(Y), end, interpret=True
    )
    out4 = rosenbrock.owlqn_trial_pair_gram_pallas(
        *args, _ring_major(S), _ring_major(Y), end, interpret=True,
        with_gp=True,
    )
    assert out4[5].shape == out4[6].shape == (m, 4)
    np.testing.assert_array_equal(np.asarray(out3[5]), np.asarray(out4[5][:, :3]))
    np.testing.assert_array_equal(np.asarray(out3[6]), np.asarray(out4[6][:, :3]))
    out_r = rosenbrock.owlqn_trial_pair_gram_ref(
        *args, S, Y, end, with_gp=True
    )
    np.testing.assert_allclose(np.asarray(out4[5]), np.asarray(out_r[5]),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out4[6]), np.asarray(out_r[6]),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(float(out4[10]), float(out_r[10]), rtol=1e-5)
    np.testing.assert_allclose(float(out4[11]), float(out_r[11]), rtol=1e-5)


def test_owlqn_mega_damped_trajectory(monkeypatch):
    """Damping + OWL-QN through the fused epilogue (with_gp) tracks the
    composed update_pair trajectory — which is itself pinned against the
    native oracle — and the with_gp kernel actually engages."""
    monkeypatch.setenv("LBFGS_TPU_KERNELS_INTERPRET", "1")
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams

    n = fused.MIN_FUSED_N
    engaged = []
    orig = rosenbrock.owlqn_trial_pair_gram_pallas

    def spy(*a, **k):
        if k.get("with_gp"):
            engaged.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(rosenbrock.value_and_grad.kernels, "owlqn_trial_pair_gram_pallas", spy)

    def run(fixed):
        params = LbfgsParams(
            max_iterations=20, epsilon=0.0, damping=True,
            damping_fixed=fixed,
            orthantwise=Orthantwise(1.0, 0, n - 1),
        )
        return minimize_jit(
            params, rosenbrock.initial_point(n, dtype=jnp.float32),
            rosenbrock.value_and_grad, return_state=True,
        )

    for fixed in (False, True):
        engaged.clear()
        st_k = run(fixed)
        assert engaged, "damped OW mega epilogue did not engage"
        monkeypatch.setenv("LBFGS_TPU_NO_PALLAS", "1")
        st_j = run(fixed)
        monkeypatch.delenv("LBFGS_TPU_NO_PALLAS")
        assert int(st_k.k) == int(st_j.k)
        assert int(st_k.prob.neval) == int(st_j.prob.neval)
        assert float(st_k.prob.fx) == pytest.approx(
            float(st_j.prob.fx), rel=1e-3
        )

    # the damped trajectory must differ from the undamped fused one
    # (the combination is exercised, not vacuous)
    st_d = run(False)
    st_u = _run_owlqn(n, iters=20)
    assert float(st_d.prob.fx) != float(st_u.prob.fx)


def test_owlqn_mega_on_mesh(monkeypatch):
    """shard_map variant on the 8-virtual-device mesh: trajectory at
    tolerance vs the single-device kernel run (reduction split
    reassociates — the tests/test_sharding.py contract)."""
    monkeypatch.setenv("LBFGS_TPU_KERNELS_INTERPRET", "1")
    from lbfgs_tpu import minimize as _min
    from lbfgs_tpu.parallel import kernels_on_mesh, make_mesh, shard_vector
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams

    ndev = jax.device_count()
    if ndev < 2:
        pytest.skip("needs the multi-device test runtime")
    n = max(fused.MIN_FUSED_N, ndev * fused.LANES * 16)
    params = LbfgsParams(
        max_iterations=12, epsilon=0.0,
        orthantwise=Orthantwise(c=1.0, start=0, end=n - 1),
    )
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)

    _min._RUN_CACHE.clear()
    st_single = _min.minimize_jit(params, x0, rosenbrock.value_and_grad,
                                  return_state=True)
    mesh = make_mesh()
    _min._RUN_CACHE.clear()
    with kernels_on_mesh(mesh):
        st_mesh = _min.minimize_jit(
            params, shard_vector(x0, mesh), rosenbrock.value_and_grad,
            return_state=True,
        )
    _min._RUN_CACHE.clear()
    assert int(st_mesh.k) == int(st_single.k)
    assert float(st_mesh.prob.fx) == pytest.approx(
        float(st_single.prob.fx), rel=1e-3
    )
