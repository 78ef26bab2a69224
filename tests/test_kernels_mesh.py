"""Pallas kernels under a multi-device mesh (VERDICT round-1 item #2).

Under ``parallel.kernels_on_mesh(mesh)`` every fused-kernel dispatcher
wraps its kernel in ``jax.shard_map`` over the vector axis: each device
runs the kernel on its local rows and the SMEM scalar accumulators become
shard-partials combined by ONE psum.  These tests run the kernels in
interpreter mode on the 8-virtual-device CPU mesh and pin:

- per-kernel: sharded output == single-device kernel output;
- global->local index translation for the OWL-QN [start, end) window;
- end-to-end: a sharded ``minimize_jit`` run with kernels active takes
  the same trajectory as the unsharded kernels-on run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_tpu.models import rosenbrock
from lbfgs_tpu.ops import fused
from lbfgs_tpu.parallel import kernels_on_mesh, make_mesh, shard_vector

pytestmark = pytest.mark.skipif(not fused.HAVE_PALLAS, reason="pallas unavailable")

M, N = 6, 8 * 128 * 2  # 2 ring-major rows per device


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


@pytest.fixture(autouse=True)
def _interpret_kernels():
    os.environ["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    yield
    del os.environ["LBFGS_TPU_KERNELS_INTERPRET"]


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*np.atleast_1d(shape)), jnp.float32)


def _ring(H):
    return H.reshape(M, N // fused.LANES, fused.LANES)


def test_combine_on_mesh_matches_single(mesh):
    d, S, Y = _rand(N, 0), _rand((M, N), 1), _rand((M, N), 2)
    cs, cy = _rand(M, 3), _rand(M, 4)
    r0, rr0, rd0 = fused.combine_pallas(d, _ring(S), _ring(Y), 0.7, cs, cy, interpret=True)
    with kernels_on_mesh(mesh):
        r1, rr1, rd1 = fused.combine_pallas(d, _ring(S), _ring(Y), 0.7, cs, cy, interpret=True)
    # the result vector is shard-pointwise: exactly equal
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    # scalar reductions reassociate across the 8 shard-partials
    assert float(rr1) == pytest.approx(float(rr0), rel=1e-5)
    assert float(rd1) == pytest.approx(float(rd0), rel=1e-5, abs=1e-3)
    assert len(r1.sharding.device_set) == 8  # output stays sharded


def test_combine_ow_on_mesh_matches_single(mesh):
    """OWL-QN combine with the in-pass constraint: the GLOBAL [start, end)
    window must be shifted into each shard's local index space (start=130
    is inside shard 0, end=N-7 inside shard 7 — an untranslated window
    would visibly mis-project); all three scalar byproducts psum up to
    the single-device values."""
    pg, S, Y = _rand(N, 20), _rand((M, N), 21), _rand((M, N), 22)
    cs, cy = _rand(M, 23), _rand(M, 24)
    start, end = 130, N - 7
    r0, rr0, rc20, rcd0 = fused.combine_ow_pallas(
        pg, _ring(S), _ring(Y), -0.7, cs, cy, start, end, interpret=True
    )
    with kernels_on_mesh(mesh):
        r1, rr1, rc21, rcd1 = fused.combine_ow_pallas(
            pg, _ring(S), _ring(Y), -0.7, cs, cy, start, end, interpret=True
        )
    # pointwise result (incl. the projection's zero pattern): exact
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    assert float(rr1) == pytest.approx(float(rr0), rel=1e-5)
    assert float(rc21) == pytest.approx(float(rc20), rel=1e-5)
    assert float(rcd1) == pytest.approx(float(rcd0), rel=1e-5, abs=1e-3)
    assert len(r1.sharding.device_set) == 8


def test_pair_gram_with_gp_on_mesh_matches_single(mesh):
    """The damped 4-column form under shard_map: the [m, 4] accumulators
    psum like the base form's [m, 3]."""
    d, gx, gp = _rand(N, 25), _rand(N, 26), _rand(N, 27)
    S, Y = _rand((M, N), 28), _rand((M, N), 29)
    S0, Y0, SP0, YP0 = fused.pair_gram_update_pallas(
        0.4, d, gx, gp, _ring(S), _ring(Y), 2, interpret=True, with_gp=True
    )
    with kernels_on_mesh(mesh):
        S1, Y1, SP1, YP1 = fused.pair_gram_update_pallas(
            0.4, d, gx, gp, _ring(S), _ring(Y), 2, interpret=True, with_gp=True
        )
    assert SP1.shape == (M, 4)
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S0))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y0))
    np.testing.assert_allclose(np.asarray(SP1), np.asarray(SP0), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(YP1), np.asarray(YP0), rtol=1e-4, atol=1e-3)


def test_pair_gram_on_mesh_matches_single(mesh):
    d, gx, gp = _rand(N, 5), _rand(N, 6), _rand(N, 7)
    S, Y = _rand((M, N), 8), _rand((M, N), 9)
    S0, Y0, SP0, YP0 = fused.pair_gram_update_pallas(
        0.4, d, gx, gp, _ring(S), _ring(Y), 2, interpret=True
    )
    with kernels_on_mesh(mesh):
        S1, Y1, SP1, YP1 = fused.pair_gram_update_pallas(
            0.4, d, gx, gp, _ring(S), _ring(Y), 2, interpret=True
        )
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S0))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y0))
    np.testing.assert_allclose(np.asarray(SP1), np.asarray(SP0), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(YP1), np.asarray(YP0), rtol=1e-4, atol=1e-3)


def test_owlqn_kernels_on_mesh_translate_global_window(mesh):
    """[start, end) is a GLOBAL index window; each shard must shift it by
    its axis offset.  start=130 / end=N-7 land strictly inside shard 0 and
    shard 7, so an untranslated window would visibly mis-project."""
    xp, d = _rand(N, 10), _rand(N, 11)
    wp = jnp.sign(_rand(N, 12))
    start, end = 130, N - 7
    o0 = fused.owlqn_trial_step(xp, d, wp, 0.3, start, end)
    with kernels_on_mesh(mesh):
        o1 = fused.owlqn_trial_step(xp, d, wp, 0.3, start, end)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

    x = xp.at[::5].set(0.0)
    g0 = fused.owlqn_pseudo_gradient(x, d, 0.8, start, end)
    with kernels_on_mesh(mesh):
        g1 = fused.owlqn_pseudo_gradient(x, d, 0.8, start, end)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))


def test_rosenbrock_trial_probe_on_mesh(mesh):
    xp, d = _rand(N, 13), _rand(N, 14)
    xt0, fx0, g0, dg0, gg0, xx0, ch0 = rosenbrock.trial(xp, d, 0.2)
    with kernels_on_mesh(mesh):
        xt1, fx1, g1, dg1, gg1, xx1, ch1 = rosenbrock.trial(xp, d, 0.2)
    np.testing.assert_array_equal(np.asarray(xt1), np.asarray(xt0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    assert float(fx1) == pytest.approx(float(fx0), rel=1e-5)
    assert float(dg1) == pytest.approx(float(dg0), rel=1e-4, abs=1e-2)
    assert float(gg1) == pytest.approx(float(gg0), rel=1e-5)
    assert float(xx1) == pytest.approx(float(xx0), rel=1e-5)
    assert bool(ch1) == bool(ch0)

    f0, p0 = rosenbrock.probe(xp, d, 0.2)
    with kernels_on_mesh(mesh):
        f1, p1 = rosenbrock.probe(xp, d, 0.2)
    assert float(f1) == pytest.approx(float(f0), rel=1e-5)
    assert float(p1) == pytest.approx(float(p0), rel=1e-4, abs=1e-2)


def test_mesh_requires_divisible_rows(mesh):
    """History whose row count does not divide the device count must fall
    back (can_* reports False) rather than mis-shard."""
    n_bad = 128 * 129  # 129 rows over 8 devices (>= MIN_FUSED_N)
    x = jnp.zeros(n_bad, jnp.float32)
    S = jnp.zeros((M, 129, 128), jnp.float32)
    with kernels_on_mesh(mesh):
        assert not fused.can_pair_gram_pallas(x, S)
        assert not fused.can_combine_pallas(x, S)
    assert fused.can_pair_gram_pallas(x, S)  # single-device: fine


def test_minimize_jit_sharded_kernels_on_matches_unsharded(mesh):
    """End-to-end: sharded x + kernels_on_mesh takes the same trajectory
    (same niter, matching fx) as the unsharded kernels-on run."""
    from lbfgs_tpu import minimize as _min
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.params import LbfgsParams

    params = LbfgsParams(max_iterations=10, epsilon=0.0)
    x0 = rosenbrock.initial_point(N, dtype=jnp.float32)

    _min._RUN_CACHE.clear()  # dispatch depends on env + mesh context
    try:
        st_plain = minimize_jit(params, x0, rosenbrock.value_and_grad, return_state=True)
        _min._RUN_CACHE.clear()
        with kernels_on_mesh(mesh):
            st_mesh = minimize_jit(
                params, shard_vector(x0, mesh), rosenbrock.value_and_grad,
                return_state=True,
            )
    finally:
        _min._RUN_CACHE.clear()

    assert int(st_mesh.k) == int(st_plain.k)
    assert float(st_mesh.prob.fx) == pytest.approx(float(st_plain.prob.fx), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(st_mesh.prob.x), np.asarray(st_plain.prob.x), rtol=2e-3, atol=2e-4
    )


def test_owlqn_trial_probe_on_mesh(mesh):
    """Fused OWL-QN trial under shard_map: global window translated, scalar
    accumulators psum'd, projected trial point stays sharded."""
    xp = _rand(N, 40).at[::7].set(0.0)
    d = _rand(N, 41)
    wp = jnp.sign(_rand(N, 42))
    c, start, end = 0.8, 130, N - 7
    t0 = rosenbrock.owlqn_trial(xp, d, wp, 0.37, c, start, end)
    with kernels_on_mesh(mesh):
        t1 = rosenbrock.owlqn_trial(xp, d, wp, 0.37, c, start, end)
    np.testing.assert_array_equal(np.asarray(t1[0]), np.asarray(t0[0]))
    np.testing.assert_array_equal(np.asarray(t1[2]), np.asarray(t0[2]))
    assert float(t1[1]) == pytest.approx(float(t0[1]), rel=1e-5)
    assert float(t1[4]) == pytest.approx(float(t0[4]), rel=1e-5)
    assert bool(t1[5]) == bool(t0[5])

    p0 = rosenbrock.owlqn_probe(xp, d, wp, 0.37, c, start, end)
    with kernels_on_mesh(mesh):
        p1 = rosenbrock.owlqn_probe(xp, d, wp, 0.37, c, start, end)
    assert float(p1[0]) == pytest.approx(float(p0[0]), rel=1e-5)

    from lbfgs_tpu.ops import fused as _f

    g = _rand(N, 43)
    pg0, nn0 = _f.owlqn_pseudo_gradient_norm(xp, g, c, start, end)
    with kernels_on_mesh(mesh):
        pg1, nn1 = _f.owlqn_pseudo_gradient_norm(xp, g, c, start, end)
    np.testing.assert_array_equal(np.asarray(pg1), np.asarray(pg0))
    assert float(nn1) == pytest.approx(float(nn0), rel=1e-5)


def test_trial_pair_gram_on_mesh_matches_single(mesh):
    """The fused trial+pair+Gram epilogue shard-maps like its parts:
    pointwise outputs exactly equal, scalar/product accumulators equal up
    to shard-partial reassociation."""
    xp = rosenbrock.initial_point(N, dtype=jnp.float32)
    d, gp = _rand(N, 21) * 0.01, _rand(N, 22)
    S, Y = _rand((M, N), 23) * 0.1, _rand((M, N), 24) * 0.1
    end = 4
    out0 = rosenbrock.trial_pair_gram(xp, d, gp, 0.6, _ring(S), _ring(Y), end)
    with kernels_on_mesh(mesh):
        # N here is below MIN_FUSED_N (this file exercises kernels
        # directly); the ok-predicate's mesh conditions alone must hold
        assert fused._mesh_divides(N // fused.LANES)
        assert rosenbrock._mesh_splits(N)
        out1 = rosenbrock.trial_pair_gram(xp, d, gp, 0.6, _ring(S), _ring(Y), end)
    xt0, fx0, g0, dg0, gg0, xx0, ch0, S0, Y0, SP0, YP0 = out0
    xt1, fx1, g1, dg1, gg1, xx1, ch1, S1, Y1, SP1, YP1 = out1
    np.testing.assert_array_equal(np.asarray(xt1), np.asarray(xt0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S0))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y0))
    assert float(fx1) == pytest.approx(float(fx0), rel=1e-5)
    assert float(dg1) == pytest.approx(float(dg0), rel=1e-4, abs=1e-2)
    assert float(gg1) == pytest.approx(float(gg0), rel=1e-5)
    assert float(xx1) == pytest.approx(float(xx0), rel=1e-5)
    assert bool(ch1) == bool(ch0)
    np.testing.assert_allclose(np.asarray(SP1), np.asarray(SP0), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP1), np.asarray(YP0), rtol=2e-4, atol=1e-2)


def test_pair_gram_xg_on_mesh_matches_single(mesh):
    """OWL-QN pair+Gram kernel shard-maps: rows exactly equal, products
    equal up to shard-partial reassociation."""
    x, xp, gx, gp, pg = (_rand(N, 30 + i) for i in range(5))
    S, Y = _rand((M, N), 35), _rand((M, N), 36)
    end = 2
    S0, Y0, SP0, YP0 = fused.pair_gram_update_xg_pallas(
        x, xp, gx, gp, pg, _ring(S), _ring(Y), end, interpret=True
    )
    with kernels_on_mesh(mesh):
        S1, Y1, SP1, YP1 = fused.pair_gram_update_xg_pallas(
            x, xp, gx, gp, pg, _ring(S), _ring(Y), end, interpret=True
        )
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S0))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y0))
    np.testing.assert_allclose(np.asarray(SP1), np.asarray(SP0), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP1), np.asarray(YP0), rtol=2e-4, atol=1e-2)


def test_combine_fix_on_mesh_matches_single(mesh):
    """Round-5 damped row persist inside the combine: sharded == single
    device (ring-row write lands shard-local in the aliased Y stack; the
    scalar byproducts psum up)."""
    d, S, Y = _rand(N, 30), _rand((M, N), 31), _rand((M, N), 32)
    cs, cy = _rand(M, 33), _rand(M, 34)
    end, ca, cb = 4, 0.8, -0.15
    r0, rr0, rd0, Y0 = fused.combine_fix_pallas(
        d, _ring(S), _ring(Y), 0.6, cs, cy, end, ca, cb, interpret=True
    )
    with kernels_on_mesh(mesh):
        r1, rr1, rd1, Y1 = fused.combine_fix_pallas(
            d, _ring(S), _ring(Y), 0.6, cs, cy, end, ca, cb, interpret=True
        )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y0),
                               rtol=1e-6, atol=1e-6)
    assert float(rr1) == pytest.approx(float(rr0), rel=1e-5)
    assert float(rd1) == pytest.approx(float(rd0), rel=1e-5, abs=1e-3)
    assert len(r1.sharding.device_set) == 8


def test_damped_end_to_end_on_mesh(mesh):
    """Damped minimization with kernels on the mesh (drives the sharded
    with_gp epilogue + the row-fix combine): matches the single-device
    kernel run at reassociation tolerance."""
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams
    from lbfgs_tpu.parallel import shard_vector

    n = fused.MIN_FUSED_N
    params = LbfgsParams(epsilon=0.0, max_iterations=10, damping=True,
                         constrain_step_size=False)
    from lbfgs_tpu import minimize as _min

    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    _min._RUN_CACHE.clear()  # the cache key (objective, params) would
    rep0 = minimize_jit(params, x0, rosenbrock.value_and_grad)
    _min._RUN_CACHE.clear()  # otherwise replay the un-meshed trace
    with kernels_on_mesh(mesh):
        rep1 = minimize_jit(params, shard_vector(x0, mesh),
                            rosenbrock.value_and_grad)
    _min._RUN_CACHE.clear()
    assert rep1.niter == rep0.niter
    assert rep1.fx == pytest.approx(rep0.fx, rel=5e-2, abs=1e-2)
