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


@pytest.mark.parametrize("n", [100, 65536, 65536 + 18])
def test_rosenbrock_trial_kernel_matches_ref(n):
    from lbfgs_tpu.models import rosenbrock

    xp, d = _rand(n, 9), _rand(n, 10)
    stp = 0.21
    xt_r, fx_r, g_r, dg_r, gg_r, xx_r, ch_r = rosenbrock.trial_ref(xp, d, stp)
    xt, fx, g, dg, gg, xx, ch = rosenbrock.trial_pallas(xp, d, stp, interpret=True)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_r), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), rtol=1e-4, atol=1e-3)
    assert float(fx) == pytest.approx(float(fx_r), rel=1e-5)
    assert float(dg) == pytest.approx(float(dg_r), rel=1e-4, abs=1e-2)
    assert float(gg) == pytest.approx(float(gg_r), rel=1e-4)
    assert float(xx) == pytest.approx(float(xx_r), rel=1e-5)
    assert bool(ch) == bool(ch_r) == True


def test_trial_kernel_changed_flag_detects_no_move():
    from lbfgs_tpu.models import rosenbrock

    n = 512
    xp = _rand(n, 20)
    d = jnp.zeros(n, jnp.float32)
    *_, ch = rosenbrock.trial_pallas(xp, d, 1.0, interpret=True)
    assert not bool(ch)


def test_rosenbrock_trial_protocol_attached():
    from lbfgs_tpu.models import rosenbrock

    assert rosenbrock.value_and_grad.__lbfgs_trial__ is rosenbrock.trial
    with pytest.raises(ValueError):
        rosenbrock.trial(jnp.zeros(3), jnp.zeros(3), 0.1)


def _ring_major(H):
    m, n = H.shape
    return H.reshape(m, n // fused.LANES, fused.LANES)


@pytest.mark.parametrize("end", [0, 3, 5])
def test_pair_gram_kernel_matches_ref(end):
    m, n = 6, 4096
    rng = np.random.RandomState(11)
    x, xp, gx, gp = (jnp.asarray(rng.randn(n), jnp.float32) for _ in range(4))
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    stp = 0.37
    s_r, y_r, SP_r, YP_r = fused.pair_gram_sd_ref(stp, x, gx, gp, S, Y, end)
    S_new, Y_new, SP, YP = fused.pair_gram_update_pallas(
        stp, x, gx, gp, _ring_major(S), _ring_major(Y), end, interpret=True
    )
    # the new pair is written in place into ring row `end`; other rows
    # are untouched
    np.testing.assert_array_equal(np.asarray(S_new[end]).ravel(), np.asarray(s_r))
    np.testing.assert_array_equal(np.asarray(Y_new[end]).ravel(), np.asarray(y_r))
    keep = [j for j in range(m) if j != end]
    np.testing.assert_array_equal(
        np.asarray(S_new)[keep], np.asarray(_ring_major(S))[keep]
    )
    np.testing.assert_allclose(np.asarray(SP), np.asarray(SP_r), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP), np.asarray(YP_r), rtol=2e-4, atol=1e-2)


def test_combine_kernel_matches_ref():
    m, n = 6, 4096
    rng = np.random.RandomState(12)
    d = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    cs = jnp.asarray(rng.randn(m), jnp.float32)
    cy = jnp.asarray(rng.randn(m), jnp.float32)
    gamma = 0.73
    ref = fused.combine_ref(d, S, Y, gamma, cs, cy)
    out, rr, rd = fused.combine_pallas(
        d, _ring_major(S), _ring_major(Y), gamma, cs, cy, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert float(rr) == pytest.approx(float(np.dot(np.asarray(ref), np.asarray(ref))), rel=1e-4)
    # rd = r . d (the dginit byproduct when the caller passes the gradient)
    assert float(rd) == pytest.approx(float(np.dot(np.asarray(ref), np.asarray(d))), rel=1e-4)


@pytest.mark.parametrize("m", [1, 2, 3, 5])
def test_combine_kernel_matches_ref_small_m(m):
    """The shared 4-chain accumulation helper (_chained_combination) must
    stay correct at every history size, including the m == 1 degenerate
    (single chain, no interleave partner) and odd m (uneven chain split)."""
    n = 1024
    rng = np.random.RandomState(13)
    d = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    cs = jnp.asarray(rng.randn(m), jnp.float32)
    cy = jnp.asarray(rng.randn(m), jnp.float32)
    ref = fused.combine_ref(d, S, Y, 0.7, cs, cy)
    out, rr, rd = fused.combine_pallas(
        d, _ring_major(S), _ring_major(Y), 0.7, cs, cy, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert float(rr) == pytest.approx(float(np.dot(np.asarray(ref), np.asarray(ref))), rel=1e-4)


@pytest.mark.parametrize("n", [4096, 128 * 9])
@pytest.mark.parametrize("window", [(0, 4096 - 1), (300, 1000)])
def test_combine_ow_kernel_matches_ref(n, window):
    """OWL-QN combine with the in-pass direction constraint: full-ish and
    strictly-interior [start, end) windows, whole-block and tail-masked
    grids; pins rc and all three scalar byproducts (pre-constrain norm,
    post-constrain norm, rc . pg) against the jnp oracle."""
    m = 6
    start, end = min(window[0], n - 2), min(window[1], n - 1)
    rng = np.random.RandomState(21)
    pg = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    cs = jnp.asarray(rng.randn(m), jnp.float32)
    cy = jnp.asarray(rng.randn(m), jnp.float32)
    gamma = -0.61  # the solver folds the -g0 sign into gamma
    rc_r, rr_r, rc2_r, rcd_r = fused.combine_ow_ref(
        pg, S, Y, gamma, cs, cy, start, end
    )
    Sr = S.reshape(m, n // fused.LANES, fused.LANES)
    Yr = Y.reshape(m, n // fused.LANES, fused.LANES)
    rc, rr, rc2, rcd = fused.combine_ow_pallas(
        pg, Sr, Yr, gamma, cs, cy, start, end, interpret=True
    )
    # projection decisions (zero pattern) must match exactly
    np.testing.assert_array_equal(np.asarray(rc) == 0, np.asarray(rc_r) == 0)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_r), rtol=1e-5, atol=1e-5)
    assert float(rr) == pytest.approx(float(rr_r), rel=1e-4)
    assert float(rc2) == pytest.approx(float(rc2_r), rel=1e-4)
    assert float(rcd) == pytest.approx(float(rcd_r), rel=1e-4, abs=1e-2)


@pytest.mark.parametrize("n", [128 * 9, 128 * 1001])
def test_tail_masked_grids_match_ref(n):
    """Lane-aligned n whose row count does not divide the block (the
    n=1e8 shape class): the cdiv grid's garbage tail reads must be masked
    out of every accumulator."""
    from lbfgs_tpu.models import rosenbrock

    m = 6
    rng = np.random.RandomState(13)
    xp, d = _rand(n, 1), _rand(n, 2)
    xt_r, fx_r, g_r, dg_r, *_ = rosenbrock.trial_ref(xp, d, 0.4)
    xt, fx, g, dg, *_ = rosenbrock.trial_pallas(xp, d, 0.4, interpret=True)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_r), rtol=1e-6, atol=1e-7)
    assert float(fx) == pytest.approx(float(fx_r), rel=1e-5)
    assert float(dg) == pytest.approx(float(dg_r), rel=1e-4, abs=1e-2)

    gx, gp = _rand(n, 4), _rand(n, 5)
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    s_r, y_r, SP_r, YP_r = fused.pair_gram_sd_ref(0.4, d, gx, gp, S, Y, 1)
    S_new, Y_new, SP, YP = fused.pair_gram_update_pallas(
        0.4, d, gx, gp, _ring_major(S), _ring_major(Y), 1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(S_new[1]).ravel(), np.asarray(s_r))
    np.testing.assert_allclose(np.asarray(SP), np.asarray(SP_r), rtol=3e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(YP), np.asarray(YP_r), rtol=3e-4, atol=5e-2)

    cs, cy = _rand(m, 6), _rand(m, 7)
    ref = fused.combine_ref(d, S, Y, 0.8, cs, cy)
    out, rr, rd = fused.combine_pallas(d, _ring_major(S), _ring_major(Y), 0.8, cs, cy, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert float(rr) == pytest.approx(float(np.dot(np.asarray(ref), np.asarray(ref))), rel=1e-4)
    assert float(rd) == pytest.approx(float(np.dot(np.asarray(ref), np.asarray(d))), rel=1e-4, abs=1e-2)


def test_pair_gram_rejects_untileable_n():
    m, n = 2, 100  # not a multiple of 128
    z = jnp.zeros(n, jnp.float32)
    H = jnp.zeros((m, n), jnp.float32)
    with pytest.raises(ValueError):
        fused.pair_gram_update_pallas(0.5, z, z, z, H, H, 0, interpret=True)


def test_pair_gram_rejects_flat_history():
    m, n = 2, 4096  # aligned n but [m, n] storage: must be refused loudly
    z = jnp.zeros(n, jnp.float32)
    H = jnp.zeros((m, n), jnp.float32)
    with pytest.raises(ValueError, match="ring-major"):
        fused.pair_gram_update_pallas(0.5, z, z, z, H, H, 0, interpret=True)


def test_dispatch_falls_back_on_cpu_f64():
    """On CPU/f64 the maybe-wrappers must route to the jnp reference."""
    xp = jnp.asarray(np.random.RandomState(0).randn(64))
    d = jnp.zeros_like(xp)
    wp = jnp.sign(xp)
    out = fused.owlqn_trial_step(xp, d, wp, 0.1, 0, 64)
    ref = fused.owlqn_trial_step_ref(xp, d, wp, 0.1, 0, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("n", [1 << 15, 128 * 9])
def test_probe_kernel_matches_trial_kernel(n):
    """The probe kernel's (ft, dg) must equal the full trial kernel's —
    the rematerializing searches make accept decisions on probed scalars
    and report the re-trial's values, so any mismatch would let a search
    return an fx inconsistent with its own accept decision."""
    from lbfgs_tpu.models import rosenbrock

    xp, d = _rand(n, 21), _rand(n, 22)
    _, fx_t, _, dg_t, *_ = rosenbrock.trial_pallas(xp, d, 0.37, interpret=True)
    fx_p, dg_p = rosenbrock.probe_pallas(xp, d, 0.37, interpret=True)
    # identical block shapes + accumulation order -> identical rounding
    assert float(fx_p) == float(fx_t)
    assert float(dg_p) == float(dg_t)


def test_remat_search_equals_carrying_search_kernels_on():
    """Interpret-mode (kernels active) whole-run trajectory through the
    rematerializing More-Thuente equals the jnp carrying path's results at
    a size above MIN_FUSED_N (the regime CPU tests otherwise never hit)."""
    import os

    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams

    n = 1 << 15
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    params = LbfgsParams(max_iterations=12, epsilon=0.0)

    st_plain = minimize_jit(params, x0, rosenbrock.value_and_grad, return_state=True)

    os.environ["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    try:
        from lbfgs_tpu import minimize as _min

        _min._RUN_CACHE.clear()  # env-dependent dispatch: force a re-trace
        st_k = minimize_jit(params, x0, rosenbrock.value_and_grad, return_state=True)
    finally:
        del os.environ["LBFGS_TPU_KERNELS_INTERPRET"]
        _min._RUN_CACHE.clear()

    assert int(st_k.k) == int(st_plain.k)
    assert float(st_k.prob.fx) == pytest.approx(float(st_plain.prob.fx), rel=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_k.prob.x), np.asarray(st_plain.prob.x), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("n", [65536, 65536 + 18])
def test_owlqn_trial_kernel_matches_ref(n):
    from lbfgs_tpu.models import rosenbrock

    xp = _rand(n, 30).at[::7].set(0.0)
    d = _rand(n, 31)
    wp = jnp.sign(_rand(n, 32))
    c, start, end = 0.8, 3, n - 5
    ref = rosenbrock.owlqn_trial_ref(xp, d, wp, 0.37, c, start, end)
    out = rosenbrock.owlqn_trial_pallas(xp, d, wp, 0.37, c, start, end, interpret=True)
    # projection decisions (zero pattern) must agree exactly
    np.testing.assert_array_equal(np.asarray(out[0]) == 0, np.asarray(ref[0]) == 0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]), rtol=1e-4, atol=1e-3)
    assert float(out[1]) == pytest.approx(float(ref[1]), rel=1e-5)   # fx incl. L1
    assert float(out[3]) == pytest.approx(float(ref[3]), rel=1e-4, abs=1e-2)  # dg
    assert float(out[4]) == pytest.approx(float(ref[4]), rel=1e-5)   # xx
    assert bool(out[5]) == bool(ref[5])


def test_owlqn_probe_matches_trial_bitwise():
    """Probe and trial share block shapes + accumulation order, so the
    Armijo decision scalars must be bitwise-identical (the remat search
    decides on probed values and reports the re-trial's)."""
    from lbfgs_tpu.models import rosenbrock

    n = 1 << 15
    xp, d = _rand(n, 33), _rand(n, 34)
    wp = jnp.sign(_rand(n, 35))
    c, start, end = 1.0, 0, n
    out = rosenbrock.owlqn_trial_pallas(xp, d, wp, 0.7, c, start, end, interpret=True)
    ft, dg = rosenbrock.owlqn_probe_pallas(xp, d, wp, 0.7, c, start, end, interpret=True)
    assert float(ft) == float(out[1])
    assert float(dg) == float(out[3])


@pytest.mark.parametrize("n", [65536, 65536 + 17])
def test_pseudo_gradient_norm_kernel_matches_ref(n):
    x = _rand(n, 36).at[::5].set(0.0)
    g = _rand(n, 37)
    c, start, end = 0.8, 2, n
    pg_r, nn_r = fused.owlqn_pseudo_gradient_norm_ref(x, g, c, start, end)
    pg, nn = fused.owlqn_pseudo_gradient_norm_pallas(x, g, c, start, end, interpret=True)
    np.testing.assert_allclose(np.asarray(pg), np.asarray(pg_r), rtol=1e-6)
    assert float(nn) == pytest.approx(float(nn_r), rel=1e-4)


def test_owlqn_protocols_attached():
    from lbfgs_tpu.models import rosenbrock

    assert rosenbrock.value_and_grad.__lbfgs_owlqn_trial__ is rosenbrock.owlqn_trial
    assert rosenbrock.value_and_grad.__lbfgs_owlqn_probe__ is rosenbrock.owlqn_probe


def test_owlqn_remat_search_equals_generic_kernels_on():
    """Whole-run OWL-QN trajectory with the fused trial/probe kernels
    (interpret mode) equals the generic jnp path at a size above
    MIN_FUSED_N: same niter, matching fx."""
    import os

    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu import minimize as _min
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.orthantwise import Orthantwise
    from lbfgs_tpu.params import LbfgsParams

    n = 1 << 15
    params = LbfgsParams(
        max_iterations=15, epsilon=0.0,
        orthantwise=Orthantwise(c=1.0, start=0, end=n - 1),
    )
    x0 = rosenbrock.initial_point(n, dtype=jnp.float32)
    st_plain = minimize_jit(params, x0, rosenbrock.value_and_grad, return_state=True)
    _min._RUN_CACHE.clear()
    os.environ["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    try:
        st_k = minimize_jit(params, x0, rosenbrock.value_and_grad, return_state=True)
    finally:
        del os.environ["LBFGS_TPU_KERNELS_INTERPRET"]
        _min._RUN_CACHE.clear()
    assert int(st_k.k) == int(st_plain.k)
    assert float(st_k.prob.fx) == pytest.approx(float(st_plain.prob.fx), rel=2e-4)


# ---------------------------------------------------------------------------
# Fused trial + pair + Gram epilogue (__lbfgs_trial_pair_gram__)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("end", [0, 3, 5])
def test_trial_pair_gram_kernel_matches_composed_oracle(end):
    """The one-pass epilogue equals trial_ref + pair_gram_sd_ref composed:
    exact x/g/rows (elementwise, deterministic), f32-tolerance scalars and
    Gram products (SMEM accumulation reassociates)."""
    from lbfgs_tpu.models import rosenbrock

    m, n = 6, 4096
    rng = np.random.RandomState(7)
    xp = rosenbrock.initial_point(n, dtype=jnp.float32)
    d = jnp.asarray(rng.randn(n) * 0.01, jnp.float32)
    gp = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    Y = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    stp = 0.7
    out = rosenbrock.trial_pair_gram_pallas(
        xp, d, gp, stp, _ring_major(S), _ring_major(Y), end, interpret=True
    )
    xt_k, fx_k, g_k, dg_k, gg_k, xx_k, ch_k, S_new, Y_new, SP_k, YP_k = out
    xt_r, fx_r, g_r, dg_r, gg_r, xx_r, ch_r = rosenbrock.trial_ref(xp, d, stp)
    s_r, y_r, SP_r, YP_r = fused.pair_gram_sd_ref(stp, d, g_r, gp, S, Y, end)

    # in-kernel FMA rounds xp + stp*d differently on some elements (same
    # allowance as the OWL-QN trial-step kernel test)
    np.testing.assert_allclose(np.asarray(xt_k), np.asarray(xt_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), rtol=1e-6, atol=1e-5)
    assert float(fx_k) == pytest.approx(float(fx_r), rel=1e-5)
    assert float(dg_k) == pytest.approx(float(dg_r), rel=1e-4)
    assert float(gg_k) == pytest.approx(float(gg_r), rel=1e-5)
    assert float(xx_k) == pytest.approx(float(xx_r), rel=1e-5)
    assert bool(ch_k) == bool(ch_r)
    # new pair written in place into ring row `end`; other rows untouched
    np.testing.assert_allclose(
        np.asarray(S_new[end]).ravel(), np.asarray(s_r), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(Y_new[end]).ravel(), np.asarray(y_r), rtol=1e-6
    )
    keep = [j for j in range(m) if j != end]
    np.testing.assert_array_equal(
        np.asarray(S_new)[keep], np.asarray(_ring_major(S))[keep]
    )
    np.testing.assert_allclose(np.asarray(SP_k), np.asarray(SP_r), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP_k), np.asarray(YP_r), rtol=2e-4, atol=1e-2)


def test_trial_pair_gram_tail_masked_grid():
    """Non-HIST_BLOCK_ROWS-divisible n: tail-block garbage must not leak
    into any accumulator."""
    from lbfgs_tpu.models import rosenbrock

    m, n = 6, 128 * 9  # 9 rows: one partial tail block
    rng = np.random.RandomState(8)
    xp = rosenbrock.initial_point(n, dtype=jnp.float32)
    d = jnp.asarray(rng.randn(n) * 0.01, jnp.float32)
    gp = jnp.asarray(rng.randn(n), jnp.float32)
    S = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    Y = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    out = rosenbrock.trial_pair_gram_pallas(
        xp, d, gp, 0.5, _ring_major(S), _ring_major(Y), 1, interpret=True
    )
    _, fx_k, _, dg_k, gg_k, xx_k, _, _, _, SP_k, YP_k = out
    _, fx_r, g_r, dg_r, gg_r, xx_r, _ = rosenbrock.trial_ref(xp, d, 0.5)
    _, _, SP_r, YP_r = fused.pair_gram_sd_ref(0.5, d, g_r, gp, S, Y, 1)
    assert float(fx_k) == pytest.approx(float(fx_r), rel=1e-5)
    assert float(dg_k) == pytest.approx(float(dg_r), rel=1e-4)
    assert float(gg_k) == pytest.approx(float(gg_r), rel=1e-5)
    assert float(xx_k) == pytest.approx(float(xx_r), rel=1e-5)
    np.testing.assert_allclose(np.asarray(SP_k), np.asarray(SP_r), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(YP_k), np.asarray(YP_r), rtol=2e-4, atol=1e-2)


def test_trial_pair_gram_bitwise_remat_contract():
    """Cross-kernel remat contract (solver.propagate_core use_mega path):
    the carried fx comes from the probe kernel while x comes from the
    trial_pair_gram kernel — the invariant fx == f(x) rests on the three
    programs (probe, trial, trial+pair+Gram) rounding xp + stp*d and the
    objective IDENTICALLY.  Pin it bitwise so a future block-size or FMA
    contraction change in any one kernel fails loudly."""
    from lbfgs_tpu.models import rosenbrock

    m, n = 6, 128 * 41  # tail-masked grid, like production shapes
    rng = np.random.RandomState(9)
    xp = rosenbrock.initial_point(n, dtype=jnp.float32)
    d = jnp.asarray(rng.randn(n) * 0.01, jnp.float32)
    gp = jnp.asarray(rng.randn(n), jnp.float32)
    S = _ring_major(jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32))
    Y = _ring_major(jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32))
    stp = 0.7
    xt_t, fx_t, *_ = rosenbrock.trial_pallas(xp, d, stp, interpret=True)
    fx_p, _dg_p = rosenbrock.probe_pallas(xp, d, stp, interpret=True)
    out = rosenbrock.trial_pair_gram_pallas(xp, d, gp, stp, S, Y, 2, interpret=True)
    xt_m, fx_m = out[0], out[1]
    np.testing.assert_array_equal(np.asarray(xt_m), np.asarray(xt_t))
    # THE remat contract: the probed ft is the fx of record (the solver
    # carries ls.fx), so probe and trial must agree bit-for-bit (same
    # BLOCK_ROWS partition + accumulation order by construction).  The
    # epilogue kernel's own fx output is UNUSED by the solver and its
    # grid partition differs (epilogue_grid shrinks blocks at short
    # grids), so it matches at reassociation tolerance only.
    assert float(fx_t) == float(fx_p)
    np.testing.assert_allclose(float(fx_m), float(fx_t), rtol=1e-6)


def test_trial_pair_gram_protocol_attached_and_engages():
    """The solver's static decision turns the epilogue on for the shipping
    config (fused kernels active, compact two-loop, no damping/OWL-QN)."""
    import os

    from lbfgs_tpu.core import hist_store_shape
    from lbfgs_tpu.models import rosenbrock

    assert rosenbrock.value_and_grad.__lbfgs_trial_pair_gram__ is rosenbrock.trial_pair_gram
    n = max(fused.MIN_FUSED_N, 128 * 8 * jnp.ones(1).size * 8)
    n = fused.MIN_FUSED_N if fused.MIN_FUSED_N % (128 * 8) == 0 else 128 * 64
    x = rosenbrock.initial_point(n, dtype=jnp.float32)
    S = jnp.zeros(hist_store_shape(6, n), jnp.float32)
    if len(S.shape) != 3:
        import pytest as _pt
        _pt.skip("ring-major storage unavailable at this n/device count")
    os.environ["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    try:
        assert rosenbrock.trial_pair_gram_ok(x, S)
    finally:
        del os.environ["LBFGS_TPU_KERNELS_INTERPRET"]


@pytest.mark.parametrize("end", [0, 5])
@pytest.mark.parametrize("n", [4096, 128 * 9])
def test_pair_gram_xg_kernel_matches_ref(end, n):
    """OWL-QN pair+Gram kernel (s = x - xp, d0 = -pg) vs the jnp oracle,
    incl. a partial tail block."""
    m = 6
    rng = np.random.RandomState(17)
    x, xp, gx, gp, pg = (jnp.asarray(rng.randn(n), jnp.float32) for _ in range(5))
    S = jnp.asarray(rng.randn(m, n), jnp.float32)
    Y = jnp.asarray(rng.randn(m, n), jnp.float32)
    s_r, y_r, SP_r, YP_r = fused.pair_gram_xg_ref(x, xp, gx, gp, pg, S, Y, end)
    S_new, Y_new, SP, YP = fused.pair_gram_update_xg_pallas(
        x, xp, gx, gp, pg, _ring_major(S), _ring_major(Y), end, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(S_new[end]).ravel(), np.asarray(s_r))
    np.testing.assert_array_equal(np.asarray(Y_new[end]).ravel(), np.asarray(y_r))
    keep = [j for j in range(m) if j != end]
    np.testing.assert_array_equal(
        np.asarray(S_new)[keep], np.asarray(_ring_major(S))[keep]
    )
    np.testing.assert_allclose(np.asarray(SP), np.asarray(SP_r), rtol=3e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(YP), np.asarray(YP_r), rtol=3e-4, atol=5e-2)


def test_kernel_grid_block_bump_is_operand_aware(monkeypatch):
    """Round-5 block defaults: 1024 rows, bumped to 2048 at n >= 2^25 for
    kernels of <= 4 vector blocks ONLY (a 5-block kernel at 2048 rows
    overflows Mosaic's 16 MB scoped VMEM — measured on v5e), and an
    explicit LBFGS_TPU_BLOCK_ROWS always wins."""
    monkeypatch.setattr(fused, "BLOCK_ROWS", 1024)
    monkeypatch.setattr(fused, "_BLOCK_ROWS_EXPLICIT", False)
    small, big = 1 << 24, 1 << 27
    assert fused.kernel_grid(small, nblk=4)[1] == 1024
    assert fused.kernel_grid(big, nblk=4)[1] == 2048
    assert fused.kernel_grid(big, nblk=2)[1] == 2048
    assert fused.kernel_grid(big, nblk=5)[1] == 1024   # VMEM gate
    # explicit env pin disables the bump
    monkeypatch.setattr(fused, "_BLOCK_ROWS_EXPLICIT", True)
    assert fused.kernel_grid(big, nblk=4)[1] == 1024
    # explicit target (history kernels) is never bumped
    assert fused.kernel_grid(big, 768)[1] == 768
    # tiny n: block clamps to the rounded row count regardless
    assert fused.kernel_grid(4096, nblk=4)[1] == 32
