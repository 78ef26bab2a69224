"""The objective-agnostic fused-kernel factory (round-5 VERDICT item #1).

``ops/factory.make_fused_objective(block_fn)`` must give ANY separable
objective the complete ``__lbfgs_*__`` kernel protocol with zero bespoke
kernel code — the TPU answer to the reference's objective-agnostic eval
boundary (``src/core.rs:119-132``).  Pinned here with the separable
family (``models/separable``):

- kernel-vs-oracle equality for every generated kernel (interpret mode),
  including tail-masked grids and the extra operand streams;
- solver engagement: the one-kernel epilogue and combine+probe protocols
  actually fire for a factory objective;
- OWL-QN on the diagonal quadratic against its ANALYTIC soft-threshold
  solution;
- extras and global-index bodies under an 8-device kernels_on_mesh
  (shard-local extras slices + shard-offset gidx).

Rosenbrock itself is re-expressed through the factory since round 5; its
bitwise trajectory parity is pinned by the existing suite
(tests/test_native_parity.py and the golden asserts).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgs_tpu.models import separable
from lbfgs_tpu.ops import factory, fused
from lbfgs_tpu.params import LbfgsParams
from lbfgs_tpu.parallel import kernels_on_mesh, make_mesh

pytestmark = pytest.mark.skipif(not fused.HAVE_PALLAS,
                                reason="pallas unavailable")

M = 6


@pytest.fixture(autouse=True)
def _interpret_kernels():
    os.environ["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    yield
    del os.environ["LBFGS_TPU_KERNELS_INTERPRET"]


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*np.atleast_1d(shape)) * scale,
        jnp.float32,
    )


def _quad(n, seed=0):
    w = 0.5 + jnp.abs(_rand(n, seed + 1))
    t = _rand(n, seed + 2)
    return separable.quadratic(w, t), w, t


def _ring(H):
    m, n = H.shape
    return H.reshape(m, n // fused.LANES, fused.LANES)


def test_sphere_synthesized_vag():
    """No value_and_grad given: the factory synthesizes one from the
    block body (incl. the lane-padding tail path, n % 128 != 0)."""
    obj = separable.sphere()
    for n in (256, 300):
        x = _rand(n, 3)
        fx, g = obj(x)
        assert float(fx) == pytest.approx(float(0.5 * jnp.sum(x * x)),
                                          rel=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(x), rtol=1e-6)


@pytest.mark.parametrize("n", [4096, 128 * 9])  # aligned + partial tail
def test_quadratic_trial_probe_kernels(n):
    obj, w, t = _quad(n)
    k = obj.kernels
    xp, d = _rand(n, 10), _rand(n, 11)
    ref = k.trial_ref(xp, d, 0.37)
    out = k.trial_pallas(xp, d, 0.37, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
    ft, dg = k.probe_pallas(xp, d, 0.37, interpret=True)
    # probe scalars bitwise-match the materializing trial's (remat
    # contract: same block shapes + accumulation order)
    assert float(ft) == float(out[1])
    assert float(dg) == float(out[3])


def test_quadratic_owlqn_trial_probe_kernels():
    n = 4096
    obj, w, t = _quad(n, seed=20)
    k = obj.kernels
    xp, d, pg = _rand(n, 21), _rand(n, 22), _rand(n, 23)
    ms = lambda v: jnp.where(jnp.isnan(v), 0.0, jnp.sign(v))
    wp = jnp.where(xp == 0.0, ms(-pg), ms(xp))
    c, lo, hi = 0.25, 130, n - 7
    ref = k.owlqn_trial_ref(xp, d, wp, 0.5, c, lo, hi)
    out = k.owlqn_trial_pallas(xp, d, wp, 0.5, c, lo, hi, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
    ftp, dgp = k.owlqn_probe_pallas(xp, d, wp, 0.5, c, lo, hi,
                                    interpret=True)
    assert float(ftp) == float(out[1])
    # pg-probe recomputes the same orthant in-register
    ftg, dgg = k.owlqn_probe_pg_pallas(xp, d, pg, 0.5, c, lo, hi,
                                       interpret=True)
    assert float(ftg) == float(ftp)
    assert float(dgg) == float(dgp)


def test_quadratic_epilogue_kernels():
    n = 4096
    obj, w, t = _quad(n, seed=30)
    k = obj.kernels
    xp, d, gp, pg = (_rand(n, 31), _rand(n, 32), _rand(n, 33),
                     _rand(n, 34))
    S, Y = _rand((M, n), 35, 0.1), _rand((M, n), 36, 0.1)
    end = 2
    # plain epilogue vs composed oracle
    out = k.trial_pair_gram_pallas(xp, d, gp, 0.37, _ring(S), _ring(Y),
                                   end, interpret=True, with_gp=True)
    xt, fx, g, dg, gg, xx, changed, S_new, Y_new, SP, YP = out
    xt_r, fx_r, g_r, dg_r, gg_r, xx_r, _ = k.trial_ref(xp, d, 0.37)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), rtol=1e-5,
                               atol=1e-5)
    assert float(fx) == pytest.approx(float(fx_r), rel=1e-5)
    s_ref = 0.37 * d
    y_ref = g_r - gp
    np.testing.assert_allclose(
        np.asarray(S_new.reshape(M, n)[end]), np.asarray(s_ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(Y_new.reshape(M, n)[end]), np.asarray(y_ref),
        rtol=1e-5, atol=1e-5)
    S_full = S.at[end].set(s_ref)
    SP_ref = jnp.stack([S_full @ y_ref, S_full @ s_ref, S_full @ (-g_r),
                        S_full @ gp], axis=1)
    np.testing.assert_allclose(np.asarray(SP), np.asarray(SP_ref),
                               rtol=2e-4, atol=2e-3)
    # OWL-QN epilogue vs composed oracle
    c, lo, hi = 0.25, 0, n
    out_ow = k.owlqn_trial_pair_gram_pallas(
        xp, d, gp, pg, 0.5, c, lo, hi, _ring(S), _ring(Y), end,
        interpret=True, with_gp=True,
    )
    ref_ow = k.owlqn_trial_pair_gram_ref(
        xp, d, gp, pg, 0.5, c, lo, hi, S, Y, end, with_gp=True,
    )
    labels = ("x", "g", "pg", "S", "Y", "SP", "YP", "xx", "pgpg",
              "changed", "gpgp", "gppg")
    for name, o, r in zip(labels, out_ow, ref_ow):
        if name in ("S", "Y"):
            o = o.reshape(M, n)
        np.testing.assert_allclose(
            np.asarray(o, dtype=np.float64), np.asarray(r, dtype=np.float64),
            rtol=2e-4, atol=2e-3, err_msg=name)


def test_quadratic_combine_probe_kernels():
    n = 4096
    obj, w, t = _quad(n, seed=40)
    k = obj.kernels
    g, x, pg = _rand(n, 41), _rand(n, 42), _rand(n, 43)
    S, Y = _rand((M, n), 44, 0.1), _rand((M, n), 45, 0.1)
    cs, cy = _rand(M, 46, 0.1), _rand(M, 47, 0.1)
    ref = k.combine_probe_ref(g, x, S, Y, -0.4, cs, cy)
    out = k.combine_probe_pallas(g, x, _ring(S), _ring(Y), -0.4, cs, cy,
                                 interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=1e-2)
    ref_ow = k.combine_ow_probe_ref(pg, x, S, Y, -0.4, cs, cy, 0.25,
                                    130, n - 7)
    out_ow = k.combine_ow_probe_pallas(pg, x, _ring(S), _ring(Y), -0.4,
                                       cs, cy, 0.25, 130, n - 7,
                                       interpret=True)
    for r, o in zip(ref_ow, out_ow):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=1e-2)


def test_quadratic_solver_engages_epilogue(monkeypatch):
    """End-to-end: a factory objective (with extras!) drives the fused
    epilogue + combine+probe hot path, and the kernel trajectory matches
    the jnp path at f32-reassociation tolerance."""
    from lbfgs_tpu.minimize import minimize_jit

    n = fused.MIN_FUSED_N
    obj, w, t = _quad(n, seed=50)
    params = LbfgsParams(epsilon=1e-5, max_iterations=60,
                         constrain_step_size=False)

    engaged = []
    orig = obj.kernels.trial_pair_gram_pallas

    def spy(*a, **kw):
        engaged.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(obj.kernels, "trial_pair_gram_pallas", spy)
    x0 = jnp.zeros((n,), jnp.float32)
    rep_k = minimize_jit(params, x0, obj)
    assert engaged, "factory epilogue did not engage"
    # quadratic: exact solution is t
    np.testing.assert_allclose(np.asarray(rep_k.x), np.asarray(t),
                               rtol=1e-3, atol=1e-3)

    # fresh (identical-math) objective: minimize_jit caches the compiled
    # run per (objective, params), so re-using `obj` would replay the
    # kernel trace and ignore the env switch
    obj2, _, _ = _quad(n, seed=50)
    monkeypatch.setenv("LBFGS_TPU_NO_PALLAS", "1")
    rep_j = minimize_jit(params, x0, obj2)
    assert rep_k.niter == pytest.approx(rep_j.niter, abs=2)
    assert rep_k.fx == pytest.approx(rep_j.fx, rel=1e-2, abs=1e-4)


def test_quartic_nontrivial_convergence():
    """A non-quadratic separable family member: the history must learn
    real curvature; kernel and jnp paths agree on the minimizer (0)."""
    from lbfgs_tpu.minimize import minimize_jit

    n = fused.MIN_FUSED_N
    w = 0.5 + jnp.abs(_rand(n, 60))
    obj = separable.scaled_quartic(w)
    params = LbfgsParams(epsilon=1e-5, max_iterations=80,
                         constrain_step_size=False)
    x0 = _rand(n, 61)
    rep = minimize_jit(params, x0, obj)
    assert rep.fx < 1e-8
    assert float(jnp.max(jnp.abs(rep.x))) < 1e-3


def test_owlqn_quadratic_soft_threshold(monkeypatch):
    """OWL-QN on the diagonal quadratic has the ANALYTIC solution
    x* = sign(t) * max(|t| - c/w, 0): the factory's OWL-QN kernel path
    must land on it (and engage the OW one-kernel epilogue)."""
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.orthantwise import Orthantwise

    n = fused.MIN_FUSED_N
    obj, w, t = _quad(n, seed=70)
    c = 0.3
    # epsilon sized to the f32 objective-resolution floor: at this n the
    # fx magnitude is ~3e3 (ULP ~2.4e-4) and the Armijo ladder stalls
    # below gnorm ~4e-3 (the same wall params.fx_wide exists for —
    # PERF.md round 4); 1e-4 scaled converges well above it
    params = LbfgsParams(
        epsilon=1e-4, max_iterations=200, constrain_step_size=False,
        orthantwise=Orthantwise(c=c, start=0, end=None),
    )

    engaged = []
    orig = obj.kernels.owlqn_trial_pair_gram_pallas

    def spy(*a, **kw):
        engaged.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(obj.kernels, "owlqn_trial_pair_gram_pallas", spy)
    x0 = jnp.zeros((n,), jnp.float32)
    rep = minimize_jit(params, x0, obj)
    assert engaged, "factory OWL-QN epilogue did not engage"
    x_star = jnp.sign(t) * jnp.maximum(jnp.abs(t) - c / w, 0.0)
    np.testing.assert_allclose(np.asarray(rep.x), np.asarray(x_star),
                               rtol=1e-2, atol=2e-3)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


def test_quadratic_extras_on_mesh(mesh):
    """Extras must shard WITH the vector (a closure capture inside
    shard_map would be replicated): sharded kernel == single-device."""
    n = 8 * 128 * 4
    obj, w, t = _quad(n, seed=80)
    k = obj.kernels
    xp, d = _rand(n, 81), _rand(n, 82)
    xt0, fx0, g0, dg0, gg0, xx0, ch0 = k.trial_pallas(xp, d, 0.37,
                                                      interpret=True)
    with kernels_on_mesh(mesh):
        out = k.trial(xp, d, 0.37)
    xt1, fx1, g1, dg1, gg1, xx1, ch1 = out
    # pointwise math, but different jit programs may fuse FMAs
    # differently on CPU: tight tolerance instead of bitwise
    np.testing.assert_allclose(np.asarray(xt1), np.asarray(xt0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-6, atol=1e-6)
    assert float(fx1) == pytest.approx(float(fx0), rel=1e-5)
    assert float(dg1) == pytest.approx(float(dg0), rel=1e-5, abs=1e-3)


def test_gidx_dependent_body_on_mesh(mesh):
    """A block body that reads the GLOBAL element index: each shard's
    kernel must see offset indices (an unshifted gidx would weight shard
    k like shard 0 — visibly wrong)."""
    n = 8 * 128 * 2

    def block(x, gidx):
        w = 1.0 + 0.1 * (gidx % 7).astype(x.dtype)
        return 0.5 * (w * (x * x)), w * x

    obj = factory.make_fused_objective(block)
    k = obj.kernels
    xp, d = _rand(n, 90), _rand(n, 91)
    ref = k.trial_ref(xp, d, 0.4)  # synthesized vag: global arange
    with kernels_on_mesh(mesh):
        out = k.trial(xp, d, 0.4)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]),
                               rtol=1e-6)
    assert float(out[1]) == pytest.approx(float(ref[1]), rel=1e-5)


def test_quadratic_epilogue_on_mesh(mesh):
    """The full epilogue (extras + ring write + Gram psum) on the mesh."""
    n = 8 * 128 * 2
    obj, w, t = _quad(n, seed=95)
    k = obj.kernels
    xp, d, gp = _rand(n, 96), _rand(n, 97), _rand(n, 98)
    S, Y = _rand((M, n), 99, 0.1), _rand((M, n), 100, 0.1)
    out0 = k.trial_pair_gram_pallas(xp, d, gp, 0.3, _ring(S), _ring(Y), 1,
                                    interpret=True)
    with kernels_on_mesh(mesh):
        out1 = k.trial_pair_gram(xp, d, gp, 0.3, _ring(S), _ring(Y), 1)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out0[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out0[2]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1[9]), np.asarray(out0[9]),
                               rtol=1e-4, atol=1e-3)  # SP
    np.testing.assert_allclose(np.asarray(out1[10]), np.asarray(out0[10]),
                               rtol=1e-4, atol=1e-3)  # YP
