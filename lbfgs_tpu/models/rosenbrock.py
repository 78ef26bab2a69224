"""Extended Rosenbrock objective (the reference's default/benchmark problem).

Per-pair form with a = 1, b = 10 (squared inside), exactly matching the
reference ``default_evaluate`` (``src/lib.rs:79-94``; also
``examples/sample.rs:26-41`` and ``benches/rosenbrock.rs:16-29``):

    for even i:  t1 = 1 - x_i;  t2 = 10*(x_{i+1} - x_i^2)
                 g_{i+1} = 20*t2;  g_i = -2*(x_i*g_{i+1} + t1)
                 fx += t1^2 + t2^2

Fully vectorized over pairs: on a sharded vector the gradient is
shard-local elementwise work and fx is one reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops import fused
from ..ops import vecmath as vm


def value_and_grad(x: Array) -> tuple[Array, Array]:
    """TPU-friendly evaluation: instead of even/odd strided gathers and a
    stack/reshape interleave (lane-shuffle-heavy on TPU), compute on the
    full vector with one left/right rotate and a parity mask — pure
    elementwise VPU work plus one reduction.  At every even position i the
    pair (x_i, x_{i+1}) is visible as (x, roll(x, -1)); gradient values
    for odd positions are produced at the even position and rotated into
    place."""
    n = x.shape[0]
    if n % 2:
        # the pair form is defined for even n only; the reference panics on
        # odd n (index out of bounds in the pair loop) — fail loudly too
        raise ValueError(f"extended Rosenbrock requires even n, got {n}")
    # explicit i32: under jax_enable_x64 (the wide-fx config) a default
    # arange is int64, whose emulated elementwise ops cost ~4x on the
    # v5e (measured: 8.9 -> 2.2 ms for this mask+sum pass at n=2^24)
    even = (jnp.arange(n, dtype=jnp.int32) % 2) == 0
    x_next = jnp.roll(x, -1)  # x_{i+1} at position i (valid at even i)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2              # g_{i+1}, computed at even position i
    ge = -2.0 * (x * go + t1)   # g_i, at even position i
    # obj_sum: two-stage (f32 block partials, f64 total) under wide_fx,
    # plain jnp.sum otherwise — keeps the jnp path's objective resolution
    # consistent with the kernels'
    fx = fused.obj_sum(jnp.where(even, t1 * t1 + t2 * t2, 0.0))
    g = jnp.where(even, ge, jnp.roll(go, 1))
    return fx, g


value_and_grad.__lbfgs_value_and_grad__ = True


# ---------------------------------------------------------------------------
# Fused line-search trial (the __lbfgs_trial__ protocol)
# ---------------------------------------------------------------------------
#
# A line-search trial is `x = xp + stp*d; (fx, g) = f(x); dg = g . d` — four
# HBM passes over the vector when composed from separate ops (the trial
# step, the two rotates inside value_and_grad, and the dg reduction).  The
# Pallas kernel below does the whole trial in ONE pass: read xp and d,
# write x and g, and carry the fx / dg partial sums in SMEM across the
# (sequential) TPU grid.  The pair structure (2i, 2i+1) never crosses a
# 128-lane row because 128 is even, so both rotates are lane-local and the
# kernel needs no halo exchange.

if fused.HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _trial_kernel(stp_ref, n_ref, xp_ref, d_ref, xt_ref, g_ref, acc_ref, fxp_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(5):
            acc_ref[0, c] = jnp.float32(0.0)

    stp = stp_ref[0]
    n = n_ref[0]
    xp = xp_ref[:]
    dd = d_ref[:]
    x = xp + stp * dd
    xt_ref[:] = x
    R, L = x.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    even = (cols % 2) == 0
    # x_{i+1} seen from even lane i: a lane-left rotate (row-local; lane
    # L-1 wraps to lane 0 but is odd, hence unused)
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2              # g_{i+1}, produced at even lane i
    ge = -2.0 * (x * go + t1)   # g_i
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))
    g_ref[:] = g

    def accumulate(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        acc_ref[0, 0] += bfx                                        # fx
        fxp_ref[i, 0] = bfx     # per-block partial (wide-fx f64 reduce)
        acc_ref[0, 1] += msum(g * dd)                               # dg
        acc_ref[0, 2] += msum(g * g)                                # ||g||^2
        acc_ref[0, 3] += msum(x * x)                                # ||x||^2
        # exact "did the step move x in floating point" count, feeding
        # the reference's x-not-changed error (src/lbfgs.rs:646)
        acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))

    # lanes past the array (zero padding OR tail-block garbage reads)
    # must not contribute to any accumulator; the mask is predicated to
    # the partial tail block only (it costs real VPU work)
    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        in_arr = gidx < n
        accumulate(
            lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & in_arr, a, 0.0)),
        )


def trial_pallas(xp: Array, d: Array, stp, interpret: bool = False):
    """One-pass fused trial: (xt, fx, g, dg, gg, xx, changed) from
    (xp, d, stp) — see the ``__lbfgs_trial__`` protocol in
    ``linesearch._trial``.  gg = g.g and xx = x.x feed the solver's
    carried stop-condition norms; ``changed`` counts elements where the
    step moved x in floating point (the reference's x-not-changed input,
    ``src/lbfgs.rs:646``) — all free byproducts of the single pass."""
    n = xp.shape[0]
    L = fused.LANES
    xp2, nb, BR = fused._to_blocks(xp)
    d2, _, _ = fused._to_blocks(d)
    stp_a = jnp.asarray([stp], xp.dtype)
    n_a = jnp.asarray([n], jnp.int32)
    blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    xt, g, acc, fxp = fused.pallas_call32(
        _trial_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
        ],
        out_specs=(blk(), blk(), pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
            jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
            jax.ShapeDtypeStruct((1, 5), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        interpret=interpret,
    )(stp_a, n_a, xp2, d2)
    a = lambda c: acc[0, c].astype(xp.dtype)
    fx = (fused.obj_reduce(fxp[:, 0], xp.dtype)
          if fused.wide_fx_active() else a(0))
    return (
        xt.reshape(-1)[:n],
        fx,
        g.reshape(-1)[:n],
        a(1),
        a(2),
        a(3),
        acc[0, 4] > 0.0,
    )


def trial_ref(xp: Array, d: Array, stp):
    """jnp fallback of the fused trial (also the test oracle)."""
    xt = xp + stp * d
    fx, g = value_and_grad(xt)
    return (
        xt,
        fx,
        g,
        vm.dot(g, d),
        vm.dot(g, g),
        vm.dot(xt, xt),
        jnp.any(xt != xp),
    )


def _mesh_splits(n: int) -> bool:
    """A mesh shard must get a whole number of (even-sized) 128-lane rows
    so the pair structure and parity masks stay shard-local."""
    ma = fused.active_mesh()
    if ma is None:
        return True
    return n % (ma[0].devices.size * fused.LANES) == 0


def trial(xp: Array, d: Array, stp):
    if xp.shape[0] % 2:
        raise ValueError(f"extended Rosenbrock requires even n, got {xp.shape[0]}")
    # the size floor keeps the vmapped scenario-batch regime (tiny n per
    # instance) on the jnp path, where the whole batch vectorizes
    if (
        fused._use_pallas(xp, d)
        and fused._kernel_enabled("trial")
        and xp.shape[0] >= fused.MIN_FUSED_N
        and _mesh_splits(xp.shape[0])
    ):
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(stp_, xp_, d_):
                xt, fx, g, dg, gg, xx, changed = trial_pallas(
                    xp_, d_, stp_[0], interpret=fused.interpret_mode()
                )
                # fx psums separately: under wide_fx it is f64 and must
                # not be downcast by stacking with the f32 scalars
                part = jnp.stack([dg, gg, xx, changed.astype(dg.dtype)])
                return xt, g, jax.lax.psum(fx, ax), jax.lax.psum(part, ax)

            xt, g, fx, part = fused._shard_map(
                local, mesh, (P(), P(ax), P(ax)), (P(ax), P(ax), P(), P())
            )(jnp.asarray([stp], xp.dtype), xp, d)
            return xt, fx, g, part[0], part[1], part[2], part[3] > 0.0
        return trial_pallas(xp, d, stp, interpret=fused.interpret_mode())
    return trial_ref(xp, d, stp)


value_and_grad.__lbfgs_trial__ = trial


# ---------------------------------------------------------------------------
# Trial probe (the __lbfgs_trial_probe__ protocol): (ft, dg) only
# ---------------------------------------------------------------------------
#
# The line-search accept/reject ladder consumes only the two scalars; the
# rematerializing searches (linesearch._probe) call this per trip and run
# ONE full trial after the loop.  Reads xp and d, writes NOTHING — half a
# full trial's HBM traffic.  The arithmetic mirrors _trial_kernel exactly
# (same block shapes, same accumulation order) so the probed ft/dg are
# bitwise-identical to the materializing trial's.


def _probe_kernel(stp_ref, n_ref, xp_ref, d_ref, acc_ref, fxp_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(2):
            acc_ref[0, c] = jnp.float32(0.0)

    stp = stp_ref[0]
    n = n_ref[0]
    xp = xp_ref[:]
    dd = d_ref[:]
    x = xp + stp * dd
    R, L = x.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    even = (cols % 2) == 0
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))

    def accumulate(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        acc_ref[0, 0] += bfx                      # fx
        fxp_ref[i, 0] = bfx                       # per-block partial
        acc_ref[0, 1] += msum(g * dd)             # dg

    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        in_arr = gidx < n
        accumulate(
            lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & in_arr, a, 0.0)),
        )


def probe_pallas(xp: Array, d: Array, stp, interpret: bool = False):
    """(ft, dg) of one trial with zero vector writes (see _probe_kernel)."""
    n = xp.shape[0]
    L = fused.LANES
    xp2, nb, BR = fused._to_blocks(xp)
    d2, _, _ = fused._to_blocks(d)
    stp_a = jnp.asarray([stp], xp.dtype)
    n_a = jnp.asarray([n], jnp.int32)
    blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc, fxp = fused.pallas_call32(
        _probe_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, 2), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1), jnp.float32)),
        interpret=interpret,
    )(stp_a, n_a, xp2, d2)
    ft = (fused.obj_reduce(fxp[:, 0], xp.dtype)
          if fused.wide_fx_active() else acc[0, 0].astype(xp.dtype))
    return ft, acc[0, 1].astype(xp.dtype)


def probe_ref(xp: Array, d: Array, stp):
    """jnp fallback: same scalars via a full (unmaterialized) evaluation."""
    xt = xp + stp * d
    fx, g = value_and_grad(xt)
    return fx, vm.dot(g, d)


def probe(xp: Array, d: Array, stp):
    if xp.shape[0] % 2:
        raise ValueError(f"extended Rosenbrock requires even n, got {xp.shape[0]}")
    if (
        fused._use_pallas(xp, d)
        and fused._kernel_enabled("trial")
        and xp.shape[0] >= fused.MIN_FUSED_N
        and _mesh_splits(xp.shape[0])
    ):
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(stp_, xp_, d_):
                ft, dg = probe_pallas(
                    xp_, d_, stp_[0], interpret=fused.interpret_mode()
                )
                # separate psums: ft may be f64 under wide_fx
                return jax.lax.psum(ft, ax), jax.lax.psum(dg, ax)

            return fused._shard_map(local, mesh, (P(), P(ax), P(ax)), (P(), P()))(
                jnp.asarray([stp], xp.dtype), xp, d
            )
        return probe_pallas(xp, d, stp, interpret=fused.interpret_mode())
    return probe_ref(xp, d, stp)


value_and_grad.__lbfgs_trial_probe__ = probe


# ---------------------------------------------------------------------------
# Fused OWL-QN trial (the __lbfgs_owlqn_trial__ protocol)
# ---------------------------------------------------------------------------
#
# The OWL-QN line-search trial is `x = project(xp + stp*d, wp); (fx, g) =
# f(x); fx += c*sum|x[window]|; dg = g.d` — composed, that's a projection
# pass (owlqn_trial_step), the objective pass, a windowed |x| reduction
# and the dg dot: ~4 HBM traversals per trial (reference
# ``take_line_step`` src/core.rs:155-164 + ``evaluate`` src/core.rs:119-132).
# The kernels below do the whole thing in ONE pass; the probe variant
# writes nothing (the Armijo ladder consumes only ft).


def _owlqn_trial_kernel(stp_ref, meta_ref, xp_ref, d_ref, wp_ref,
                        xt_ref, g_ref, acc_ref, fxp_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(5):
            acc_ref[0, c] = jnp.float32(0.0)

    stp = stp_ref[0]
    n, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2]
    xp = xp_ref[:]
    dd = d_ref[:]
    wp = wp_ref[:]
    xr = xp + stp * dd
    R, L = xr.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    in_window = (gidx >= lo) & (gidx < hi)
    # orthant projection, fused.owlqn_trial_step semantics (msign: 0 at
    # 0/NaN; reference src/core.rs:155-164)
    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    projected = jnp.where(msign(xr) != msign(wp), jnp.zeros_like(xr), xr)
    x = jnp.where(in_window, projected, xr)
    xt_ref[:] = x

    even = (cols % 2) == 0
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))
    g_ref[:] = g

    def accumulate(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        bl1 = msum(jnp.where(in_window, jnp.abs(x), 0.0))
        acc_ref[0, 0] += bfx                                         # raw fx
        acc_ref[0, 1] += bl1                                         # |x| window
        fxp_ref[i, 0] = bfx     # per-block partials: the L1 term is the
        fxp_ref[i, 1] = bl1     # dominant magnitude at scale (wide-fx)
        acc_ref[0, 2] += msum(g * dd)                                # dg
        acc_ref[0, 3] += msum(x * x)                                 # ||x||^2
        acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))         # changed

    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        in_arr = gidx < n
        accumulate(
            lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & in_arr, a, 0.0)),
        )


def owlqn_trial_pallas(xp, d, wp, stp, c, start, end, interpret: bool = False):
    """One-pass fused OWL-QN trial: (xt, fx_incl_L1, g, dg, xx, changed)
    from (xp, d, wp, stp) — projection, objective, windowed L1, and all
    reductions in a single HBM traversal."""
    n = xp.shape[0]
    L = fused.LANES
    xp2, nb, BR = fused._to_blocks(xp)
    d2, _, _ = fused._to_blocks(d)
    wp2, _, _ = fused._to_blocks(wp)
    stp_a = jnp.asarray([stp], xp.dtype)
    meta = jnp.asarray([n, start, end], jnp.int32)
    blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    xt, g, acc, fxp = fused.pallas_call32(
        _owlqn_trial_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
            blk(),
        ],
        out_specs=(blk(), blk(), pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
            jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
            jax.ShapeDtypeStruct((1, 5), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2), jnp.float32),
        ),
        interpret=interpret,
    )(stp_a, meta, xp2, d2, wp2)
    a = lambda j: acc[0, j].astype(xp.dtype)
    ft = _owlqn_fx(acc, fxp, c, xp.dtype)
    return (
        xt.reshape(-1)[:n],
        ft,
        g.reshape(-1)[:n],
        a(2),
        a(3),
        acc[0, 4] > 0.0,
    )


def _owlqn_fx(acc, fxp, c, vdtype):
    """fx + c*L1 from the kernel scalars: the (raw fx, windowed L1)
    per-block partials reduce in f64 under wide_fx (the L1 term is what
    pins fx at the unresolvable ~4e7 scale at n = 1e8 — PERF.md), else
    the SMEM accumulators as before (bitwise-unchanged default path)."""
    if fused.wide_fx_active():
        fx = fused.obj_reduce(fxp[:, 0], vdtype)
        l1 = fused.obj_reduce(fxp[:, 1], vdtype)
        return fx + jnp.float64(c) * l1
    a = lambda j: acc[0, j].astype(vdtype)
    return a(0) + jnp.asarray(c, vdtype) * a(1)


def _owlqn_probe_kernel(stp_ref, meta_ref, xp_ref, d_ref, wp_ref, acc_ref,
                        fxp_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(3):
            acc_ref[0, c] = jnp.float32(0.0)

    stp = stp_ref[0]
    n, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2]
    xp = xp_ref[:]
    dd = d_ref[:]
    wp = wp_ref[:]
    xr = xp + stp * dd
    R, L = xr.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    in_window = (gidx >= lo) & (gidx < hi)
    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    projected = jnp.where(msign(xr) != msign(wp), jnp.zeros_like(xr), xr)
    x = jnp.where(in_window, projected, xr)

    even = (cols % 2) == 0
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))

    def accumulate(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        bl1 = msum(jnp.where(in_window, jnp.abs(x), 0.0))
        acc_ref[0, 0] += bfx
        acc_ref[0, 1] += bl1
        fxp_ref[i, 0] = bfx
        fxp_ref[i, 1] = bl1
        acc_ref[0, 2] += msum(g * dd)

    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        in_arr = gidx < n
        accumulate(
            lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & in_arr, a, 0.0)),
        )


def owlqn_probe_pallas(xp, d, wp, stp, c, start, end, interpret: bool = False):
    """(ft_incl_L1, dg) of one OWL-QN trial with zero vector writes; same
    block shapes + accumulation order as owlqn_trial_pallas, so the probed
    scalars are bitwise-identical to the materializing trial's."""
    n = xp.shape[0]
    L = fused.LANES
    xp2, nb, BR = fused._to_blocks(xp)
    d2, _, _ = fused._to_blocks(d)
    wp2, _, _ = fused._to_blocks(wp)
    stp_a = jnp.asarray([stp], xp.dtype)
    meta = jnp.asarray([n, start, end], jnp.int32)
    blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc, fxp = fused.pallas_call32(
        _owlqn_probe_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
            blk(),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, 3), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 2), jnp.float32)),
        interpret=interpret,
    )(stp_a, meta, xp2, d2, wp2)
    return _owlqn_fx(acc, fxp, c, xp.dtype), acc[0, 2].astype(xp.dtype)


def _owlqn_probe_pg_kernel(stp_ref, meta_ref, xp_ref, d_ref, pg_ref, acc_ref,
                           fxp_ref):
    """OW probe with the orthant computed IN-REGISTER from (xp, pg_old)
    instead of a materialized wp operand: removes the per-iteration
    choose_orthant vector pass (trace-measured 0.20 ms/iter at 2^24 —
    PERF.md round 4).  Bitwise-identical to the wp-operand probe (same
    formula the search's choose_orthant and the OW mega epilogue use)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(3):
            acc_ref[0, c] = jnp.float32(0.0)

    stp = stp_ref[0]
    n, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2]
    xp = xp_ref[:]
    dd = d_ref[:]
    pgo = pg_ref[:]
    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    wp = jnp.where(xp == 0.0, msign(-pgo), msign(xp))
    xr = xp + stp * dd
    R, L = xr.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    in_window = (gidx >= lo) & (gidx < hi)
    projected = jnp.where(msign(xr) != msign(wp), jnp.zeros_like(xr), xr)
    x = jnp.where(in_window, projected, xr)

    even = (cols % 2) == 0
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))

    def accumulate(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        bl1 = msum(jnp.where(in_window, jnp.abs(x), 0.0))
        acc_ref[0, 0] += bfx
        acc_ref[0, 1] += bl1
        fxp_ref[i, 0] = bfx
        fxp_ref[i, 1] = bl1
        acc_ref[0, 2] += msum(g * dd)

    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        in_arr = gidx < n
        accumulate(
            lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & in_arr, a, 0.0)),
        )


def owlqn_probe_pg_pallas(xp, d, pg, stp, c, start, end, interpret=False):
    """(ft_incl_L1, dg) of one OWL-QN trial, orthant in-register."""
    n = xp.shape[0]
    L = fused.LANES
    xp2, nb, BR = fused._to_blocks(xp)
    d2, _, _ = fused._to_blocks(d)
    pg2, _, _ = fused._to_blocks(pg)
    stp_a = jnp.asarray([stp], xp.dtype)
    meta = jnp.asarray([n, start, end], jnp.int32)
    blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc, fxp = fused.pallas_call32(
        _owlqn_probe_pg_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
            blk(),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, 3), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 2), jnp.float32)),
        interpret=interpret,
    )(stp_a, meta, xp2, d2, pg2)
    return _owlqn_fx(acc, fxp, c, xp.dtype), acc[0, 2].astype(xp.dtype)


def owlqn_probe_pg_ref(xp, d, pg, stp, c, start, end):
    """jnp fallback: materialize the orthant, then the standard probe."""
    from .. import orthantwise as ow_ops
    from ..orthantwise import Orthantwise

    wp = ow_ops.choose_orthant(Orthantwise(c=c, start=start, end=end), xp, pg)
    return owlqn_probe_ref(xp, d, wp, stp, c, start, end)


def owlqn_probe_pg(xp, d, pg, stp, c, start, end):
    out = _owlqn_dispatch(xp, d, pg, stp, c, start, end,
                          owlqn_probe_pg_pallas, owlqn_probe_pg_ref)
    if out is not None:
        return out
    from jax.sharding import PartitionSpec as P

    mesh, ax = fused.active_mesh()

    def local(stp_, xp_, d_, pg_):
        off = jax.lax.axis_index(ax) * xp_.shape[0]
        ft, dg = owlqn_probe_pg_pallas(
            xp_, d_, pg_, stp_[0], c, start - off, end - off,
            interpret=fused.interpret_mode(),
        )
        return jax.lax.psum(ft, ax), jax.lax.psum(dg, ax)

    return fused._shard_map(
        local, mesh, (P(), P(ax), P(ax), P(ax)), (P(), P())
    )(jnp.asarray([stp], xp.dtype), xp, d, pg)


value_and_grad.__lbfgs_owlqn_probe_pg__ = owlqn_probe_pg


def owlqn_trial_ref(xp, d, wp, stp, c, start, end):
    """jnp fallback of the fused OWL-QN trial (also the test oracle)."""
    xt = fused.owlqn_trial_step_ref(xp, d, wp, stp, start, end)
    fx, g = value_and_grad(xt)
    idx = jnp.arange(xt.shape[0], dtype=jnp.int32)
    l1 = fused.obj_sum(
        jnp.where((idx >= start) & (idx < end), jnp.abs(xt), 0.0)
    )
    return (
        xt,
        fx + c * l1,
        g,
        vm.dot(g, d),
        vm.dot(xt, xt),
        jnp.any(xt != xp),
    )


def owlqn_probe_ref(xp, d, wp, stp, c, start, end):
    res = owlqn_trial_ref(xp, d, wp, stp, c, start, end)
    return res[1], res[3]


def _owlqn_dispatch(xp, d, wp, stp, c, start, end, single, ref):
    if xp.shape[0] % 2:
        raise ValueError(f"extended Rosenbrock requires even n, got {xp.shape[0]}")
    if (
        fused._use_pallas(xp, d, wp)
        and fused._kernel_enabled("trial")
        and xp.shape[0] >= fused.MIN_FUSED_N
        and _mesh_splits(xp.shape[0])
    ):
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            return None  # caller handles the shard_map wrap
        return single(xp, d, wp, stp, c, start, end,
                      interpret=fused.interpret_mode())
    return ref(xp, d, wp, stp, c, start, end)


def owlqn_trial(xp, d, wp, stp, c, start, end):
    out = _owlqn_dispatch(xp, d, wp, stp, c, start, end,
                          owlqn_trial_pallas, owlqn_trial_ref)
    if out is not None:
        return out
    from jax.sharding import PartitionSpec as P

    mesh, ax = fused.active_mesh()

    def local(stp_, xp_, d_, wp_):
        off = jax.lax.axis_index(ax) * xp_.shape[0]
        xt, ft, g, dg, xx, changed = owlqn_trial_pallas(
            xp_, d_, wp_, stp_[0], c, start - off, end - off,
            interpret=fused.interpret_mode(),
        )
        # ft psums separately: f64 under wide_fx
        part = jnp.stack([dg, xx, changed.astype(dg.dtype)])
        return xt, g, jax.lax.psum(ft, ax), jax.lax.psum(part, ax)

    xt, g, ft, part = fused._shard_map(
        local, mesh, (P(), P(ax), P(ax), P(ax)), (P(ax), P(ax), P(), P())
    )(jnp.asarray([stp], xp.dtype), xp, d, wp)
    return xt, ft, g, part[0], part[1], part[2] > 0.0


def owlqn_probe(xp, d, wp, stp, c, start, end):
    out = _owlqn_dispatch(xp, d, wp, stp, c, start, end,
                          owlqn_probe_pallas, owlqn_probe_ref)
    if out is not None:
        return out
    from jax.sharding import PartitionSpec as P

    mesh, ax = fused.active_mesh()

    def local(stp_, xp_, d_, wp_):
        off = jax.lax.axis_index(ax) * xp_.shape[0]
        ft, dg = owlqn_probe_pallas(
            xp_, d_, wp_, stp_[0], c, start - off, end - off,
            interpret=fused.interpret_mode(),
        )
        return jax.lax.psum(ft, ax), jax.lax.psum(dg, ax)

    return fused._shard_map(
        local, mesh, (P(), P(ax), P(ax), P(ax)), (P(), P())
    )(jnp.asarray([stp], xp.dtype), xp, d, wp)


value_and_grad.__lbfgs_owlqn_trial__ = owlqn_trial
value_and_grad.__lbfgs_owlqn_probe__ = owlqn_probe


# ---------------------------------------------------------------------------
# Fused OWL-QN trial + pseudo-gradient + pair + Gram epilogue
# (the __lbfgs_owlqn_trial_pair_gram__ protocol)
# ---------------------------------------------------------------------------
#
# The OWL-QN analog of the plain one-kernel epilogue below: after the
# Armijo search accepts a step, the solver composed FOUR vector passes —
# the materializing projected trial (read xp/d/wp, write x/g), the
# pseudo-gradient+norm pass (read x/g, write pg), the xg pair+Gram pass
# (read x/xp/gx/gp/pg + S/Y, write ring rows), and the orthant choice wp
# (full-vector write inside the search).  Trace analysis (PERF.md round
# 4) additionally showed the fresh x/g/pg outputs force XLA to stabilize
# the while-carry buffers with full-vector copies.  This kernel does the
# WHOLE epilogue in one pass:
#
#   wp  = sign(xp) or sign(-pg_old) at zeros   (src/core.rs:167-180)
#   x   = project(xp + stp*d, wp) in-window    (src/core.rs:155-164)
#   g   = rosenbrock grad(x)                   (src/lib.rs:79-94)
#   s   = x - xp,  y = g - gp                  (src/lbfgs.rs:640-656)
#   pg  = pseudo_gradient(x, g)                (src/orthantwise.rs:82-112)
#   d0  = -pg                                  (src/lbfgs.rs:536-537)
#
# reading xp/d/gp/pg_old + S/Y once and writing x, g, pg IN PLACE over
# xp, gp, pg_old (all dead afterwards in the non-damped regime; XLA
# copy-protects any caller that still needs them), plus the (s, y) ring
# rows in place; SMEM accumulates the [m, 3] SP/YP products against
# (y, s, d0), ||x||^2, ||pg||^2 and the changed count.  The in-register
# wp is bitwise-identical to the materialized wp the search's probes
# used, so the remat contract holds.


def _owlqn_tpg_kernel(
    end_ref, nrows_ref, scal_ref, lohi_ref, xp_ref, d_ref, gp_ref, pg_ref,
    S_ref, Y_ref,
    xt_ref, g_ref, pgo_ref, s_ref, y_ref, acc_ref, sp_ref, yp_ref,
    *, with_gp=False
):
    i = pl.program_id(0)
    m, R, L = S_ref.shape
    nacc = 5 if with_gp else 3
    ncols = 4 if with_gp else 3

    @pl.when(i == 0)
    def _():
        for c in range(nacc):
            acc_ref[0, c] = jnp.float32(0.0)
        for j in range(m):
            for c in range(ncols):
                sp_ref[j, c] = jnp.float32(0.0)
                yp_ref[j, c] = jnp.float32(0.0)

    end = end_ref[0]
    stp, c_l1 = scal_ref[0], scal_ref[1]
    lo, hi = lohi_ref[0], lohi_ref[1]
    xp = xp_ref[:]
    dd = d_ref[:]
    gpv = gp_ref[:]
    pgo = pg_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = (i * jnp.int32(R) + rows) * jnp.int32(L) + cols
    in_win = (gidx >= lo) & (gidx < hi)
    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))

    # orthant from the PREVIOUS point's (x, pg) — identical to the
    # search's choose_orthant (src/core.rs:167-180)
    wp = jnp.where(xp == 0.0, msign(-pgo), msign(xp))
    xr = xp + stp * dd
    projected = jnp.where(msign(xr) != msign(wp), jnp.zeros_like(xr), xr)
    x = jnp.where(in_win, projected, xr)
    xt_ref[:] = x

    even = (cols % jnp.int32(2)) == 0
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))
    g_ref[:] = g

    # pseudo-gradient at the NEW point (Andrew & Gao Eq. 4)
    right = g + c_l1
    left = g - c_l1
    at_zero = jnp.where(right < 0.0, right, jnp.where(left > 0.0, left, 0.0))
    inside = jnp.where(x != 0.0, g + jnp.sign(x) * c_l1, at_zero)
    pg = jnp.where(in_win, inside, g)
    pgo_ref[:] = pg

    s = x - xp
    y = g - gpv
    d0 = -pg
    s_ref[0] = s.astype(s_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)

    is_tail = (i + 1) * jnp.int32(R) > nrows_ref[0]

    def accumulate(msum):
        acc_ref[0, 0] += msum(x * x)                           # ||x||^2
        acc_ref[0, 1] += msum(pg * pg)                         # ||pg||^2
        acc_ref[0, 2] += msum((x != xp).astype(jnp.float32))   # changed
        if with_gp:
            # the damped reconstruction's extra scalars: gp . gp and
            # gp . pg_new (the OW analog of the plain path's carried
            # gnorm2 — under OWL-QN the carried norm is ||pg_prev||^2,
            # not ||gp||^2, so both come from this pass); gp already
            # streams through VMEM, VPU cost only
            acc_ref[0, 3] += msum(gpv * gpv)
            acc_ref[0, 4] += msum(gpv * pg)
        for j in range(m):  # m is small and static: unrolled
            is_end = j == end
            Sj = jnp.where(is_end, s, S_ref[j].astype(s.dtype))
            Yj = jnp.where(is_end, y, Y_ref[j].astype(y.dtype))
            sp_ref[j, 0] += msum(Sj * y)
            sp_ref[j, 1] += msum(Sj * s)
            sp_ref[j, 2] += msum(Sj * d0)
            yp_ref[j, 0] += msum(Yj * y)
            yp_ref[j, 1] += msum(Yj * s)
            yp_ref[j, 2] += msum(Yj * d0)
            if with_gp:
                sp_ref[j, 3] += msum(Sj * gpv)
                yp_ref[j, 3] += msum(Yj * gpv)

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum)

    @pl.when(is_tail)
    def _():
        valid = (i * jnp.int32(R) + rows) < nrows_ref[0]
        accumulate(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))


def owlqn_trial_pair_gram_pallas(xp, d, gp, pg, stp, c, start, end_w,
                                 S, Y, end, interpret: bool = False,
                                 with_gp: bool = False):
    """One-pass OWL-QN epilogue (see _owlqn_tpg_kernel).

    Returns (x, g, pg_new, S_new, Y_new, SP, YP, xx, pgpg, changed) —
    plus (gpgp, gppg) appended when ``with_gp`` (the damped
    reconstruction's basis: 4th (. gp) product column and the gp.gp /
    gp.pg_new scalars; see solver's OW damped branch).
    S, Y must be ring-major [m, n/128, 128]; the pair lands in ring row
    ``end`` of the aliased stacks, and x/g/pg_new land in the buffers of
    xp/gp/pg (in-place carry update; under ``with_gp`` the caller still
    needs gp afterwards for the row blend — XLA copy-protects it)."""
    n = xp.shape[0]
    m = S.shape[0]
    L = fused.LANES
    if not fused.lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned")
    rows = n // L
    if S.shape != (m, rows, L):
        raise ValueError(f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
    nb, br = fused.epilogue_grid(n)
    as2 = lambda v: v.reshape(rows, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # end, nrows (used by the output index maps)
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0)),
            pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    import functools

    nacc = 5 if with_gp else 3
    ncols = 4 if with_gp else 3
    # inputs counted incl. the 2 prefetch scalars: scal(2), lohi(3),
    # xp(4), d(5), gp(6), pg(7), S(8), Y(9); outputs x(0), g(1), pg(2),
    # s(3), y(4).  In-place: xp->x, gp->g, pg->pg_new, S/Y ring rows —
    # the whole carried vector state updates without a single XLA
    # stabilization copy (PERF.md round 4).
    x, g, pg_new, S_new, Y_new, acc, SP, YP = fused.pallas_call32(
        functools.partial(_owlqn_tpg_kernel, with_gp=with_gp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, L), xp.dtype),
            jax.ShapeDtypeStruct((rows, L), xp.dtype),
            jax.ShapeDtypeStruct((rows, L), xp.dtype),
            jax.ShapeDtypeStruct((m, rows, L), S.dtype),
            jax.ShapeDtypeStruct((m, rows, L), S.dtype),
            jax.ShapeDtypeStruct((1, nacc), jnp.float32),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
        ),
        input_output_aliases={4: 0, 6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(
        jnp.asarray([end], jnp.int32),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray([stp, c], xp.dtype),
        jnp.asarray([start, end_w], jnp.int32),
        as2(xp), as2(d), as2(gp), as2(pg),
        S, Y,
    )
    a = lambda j: acc[0, j].astype(xp.dtype)
    out = (
        x.reshape(-1), g.reshape(-1), pg_new.reshape(-1), S_new, Y_new,
        SP.astype(xp.dtype), YP.astype(xp.dtype),
        a(0), a(1), acc[0, 2] > 0.0,
    )
    if with_gp:
        out = out + (a(3), a(4))
    return out


def owlqn_trial_pair_gram_ref(xp, d, gp, pg, stp, c, start, end_w, S, Y, end,
                              with_gp=False):
    """jnp oracle ([m, n] history inputs): composed from the existing
    reference pieces — choose_orthant + projected trial + objective +
    pseudo-gradient + xg pair/Gram (+ the damped (. gp) column and
    gp-scalars under ``with_gp``)."""
    from .. import orthantwise as ow_ops
    from ..orthantwise import Orthantwise

    ow = Orthantwise(c=c, start=start, end=end_w)
    wp = ow_ops.choose_orthant(ow, xp, pg)
    x = fused.owlqn_trial_step_ref(xp, d, wp, stp, start, end_w)
    _, g = value_and_grad(x)
    pg_new = ow_ops.pseudo_gradient(ow, x, g)
    s, y, SP, YP = fused.pair_gram_xg_ref(x, xp, g, gp, pg_new, S, Y, end)
    S_new, Y_new = S.at[end].set(s), Y.at[end].set(y)
    if with_gp:
        SP = jnp.concatenate(
            [SP, jnp.matmul(S_new, gp[:, None], precision="highest")], axis=1
        )
        YP = jnp.concatenate(
            [YP, jnp.matmul(Y_new, gp[:, None], precision="highest")], axis=1
        )
        return (
            x, g, pg_new, S_new, Y_new, SP, YP,
            jnp.dot(x, x), jnp.dot(pg_new, pg_new), jnp.any(x != xp),
            jnp.dot(gp, gp), jnp.dot(gp, pg_new),
        )
    return (
        x, g, pg_new, S_new, Y_new, SP, YP,
        jnp.dot(x, x), jnp.dot(pg_new, pg_new), jnp.any(x != xp),
    )


def owlqn_trial_pair_gram_ok(xp: Array, S: Array) -> bool:
    """Trace-time availability of the OWL-QN fused epilogue."""
    return (
        xp.shape[0] % 2 == 0
        and fused.can_pair_gram_pallas(xp, S)
        and fused._kernel_enabled("trial")
        and _mesh_splits(xp.shape[0])
    )


def owlqn_trial_pair_gram(xp, d, gp, pg, stp, c, start, end_w, S, Y, end,
                          with_gp=False):
    """Dispatch (shard-local under kernels_on_mesh, one psum round for the
    scalar/product accumulators, window translated per shard)."""
    ma = fused.active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        from jax.sharding import PartitionSpec as P

        mesh, ax = ma

        def local(stp_, end_, xp_, d_, gp_, pg_, S_, Y_):
            off = jax.lax.axis_index(ax) * xp_.shape[0]
            out = owlqn_trial_pair_gram_pallas(
                xp_, d_, gp_, pg_, stp_[0], c, start - off, end_w - off,
                S_, Y_, end_[0], interpret=fused.interpret_mode(),
                with_gp=with_gp,
            )
            x, g, pg_new, S_new, Y_new, SP, YP, xx, pgpg, changed = out[:10]
            scalars = [xx, pgpg, changed.astype(xx.dtype)]
            if with_gp:
                scalars += [out[10], out[11]]
            part = jnp.stack(scalars)
            return (
                x, g, pg_new, S_new, Y_new,
                jax.lax.psum(SP, ax), jax.lax.psum(YP, ax),
                jax.lax.psum(part, ax),
            )

        vec, hist, rep = P(ax), P(None, ax, None), P()
        x, g, pg_new, S_new, Y_new, SP, YP, part = fused._shard_map(
            local, mesh,
            (rep, rep, vec, vec, vec, vec, hist, hist),
            (vec, vec, vec, hist, hist, rep, rep, rep),
        )(
            jnp.asarray([stp], xp.dtype), jnp.asarray([end], jnp.int32),
            xp, d, gp, pg, S, Y,
        )
        out = (
            x, g, pg_new, S_new, Y_new, SP, YP,
            part[0], part[1], part[2] > 0.0,
        )
        if with_gp:
            out = out + (part[3], part[4])
        return out
    return owlqn_trial_pair_gram_pallas(
        xp, d, gp, pg, stp, c, start, end_w, S, Y, end,
        interpret=fused.interpret_mode(), with_gp=with_gp,
    )


value_and_grad.__lbfgs_owlqn_trial_pair_gram__ = owlqn_trial_pair_gram
value_and_grad.__lbfgs_owlqn_trial_pair_gram_ok__ = owlqn_trial_pair_gram_ok


# ---------------------------------------------------------------------------
# Fused trial + pair + Gram epilogue (the __lbfgs_trial_pair_gram__ protocol)
# ---------------------------------------------------------------------------
#
# After the rematerializing line search accepts a step, the solver needs
# (1) the materialized trial x = xp + stp*d, (fx, g) = f(x) and its
# scalars (the trial kernel), and (2) the correction pair written into the
# ring plus all 6m history products (the pair_gram kernel).  Composed,
# that is two kernels where the second re-reads d, g and gp — 192 MB of
# re-reads per iteration at n = 2^24.  This kernel does BOTH in ONE pass:
# read xp, d, gp and the S/Y history blocks once; write x, g and the new
# (s, y) ring rows in place; accumulate the five trial scalars and the
# [m, 3] SP/YP products in SMEM across the sequential grid.  The solver
# calls it from propagate_core (linesearch.find skips its materialize via
# ``materialize=False``), replacing trial + pair_gram on the hot path.
#
# Reference semantics covered: take_line_step + evaluate
# (src/core.rs:119-132, 155-164) and IterationData::update's pair
# reductions (src/lbfgs.rs:640-656) — s = stp*d exactly on the
# projection-free path, y = g - gp, d0 = -g.


def _trial_pair_gram_kernel(
    end_ref, nrows_ref, stp_ref, xp_ref, d_ref, gp_ref, S_ref, Y_ref,
    xt_ref, g_ref, s_ref, y_ref, acc_ref, sp_ref, yp_ref, fxp_ref,
    *, with_gp=False
):
    i = pl.program_id(0)
    m = S_ref.shape[0]
    ncols = 4 if with_gp else 3

    @pl.when(i == 0)
    def _():
        for c in range(5):
            acc_ref[0, c] = jnp.float32(0.0)
        for j in range(m):
            for c in range(ncols):
                sp_ref[j, c] = jnp.float32(0.0)
                yp_ref[j, c] = jnp.float32(0.0)

    end = end_ref[0]
    stp = stp_ref[0]
    xp = xp_ref[:]
    dd = d_ref[:]
    gpv = gp_ref[:]
    x = xp + stp * dd
    xt_ref[:] = x
    R, L = x.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    even = (cols % 2) == 0
    # objective block: same arithmetic as _trial_kernel (lane-local rolls)
    x_next = jnp.roll(x, -1, axis=1)
    t1 = 1.0 - x
    t2 = 10.0 * (x_next - x * x)
    go = 20.0 * t2
    ge = -2.0 * (x * go + t1)
    g = jnp.where(even, ge, jnp.roll(go, 1, axis=1))
    g_ref[:] = g

    # correction pair, written in place into ring row `end` (writes of
    # tail rows past the array are dropped by Mosaic)
    s = stp * dd
    y = g - gpv
    d0 = -g
    s_ref[0] = s.astype(s_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)

    def acc_all(msum, esum):
        bfx = esum(t1 * t1 + t2 * t2)
        acc_ref[0, 0] += bfx                                  # fx
        fxp_ref[i, 0] = bfx                                   # block partial
        acc_ref[0, 1] += msum(g * dd)                         # dg
        acc_ref[0, 2] += msum(g * g)                          # ||g||^2
        acc_ref[0, 3] += msum(x * x)                          # ||x||^2
        acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))  # changed
        for j in range(m):  # m is small and static: unrolled
            is_end = j == end
            Sj = jnp.where(is_end, s, S_ref[j].astype(s.dtype))
            Yj = jnp.where(is_end, y, Y_ref[j].astype(y.dtype))
            sp_ref[j, 0] += msum(Sj * y)
            sp_ref[j, 1] += msum(Sj * s)
            sp_ref[j, 2] += msum(Sj * d0)
            yp_ref[j, 0] += msum(Yj * y)
            yp_ref[j, 1] += msum(Yj * s)
            yp_ref[j, 2] += msum(Yj * d0)
            if with_gp:
                # damped-update basis column (solver damped_fused path):
                # gp already streams through VMEM, VPU cost only
                sp_ref[j, 3] += msum(Sj * gpv)
                yp_ref[j, 3] += msum(Yj * gpv)

    # tail blocks read garbage rows (cdiv grid, unpadded operands): mask
    # every reduction by global row index, predicated to the tail only
    is_tail = (i + 1) * R > nrows_ref[0]

    @pl.when(~is_tail)
    def _():
        acc_all(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        acc_all(
            lambda a: jnp.sum(jnp.where(valid, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & valid, a, 0.0)),
        )


def trial_pair_gram_pallas(xp, d, gp, stp, S, Y, end, interpret: bool = False,
                           with_gp: bool = False):
    """One-pass trial + pair + Gram epilogue (see _trial_pair_gram_kernel).

    Returns (xt, fx, g, dg, gg, xx, changed, S_new, Y_new, SP, YP) — the
    trial kernel's outputs plus pair_gram_update_pallas's.  S, Y must be
    ring-major [m, n/128, 128]; the new pair lands in ring row ``end`` of
    the aliased stacks.  ``with_gp`` appends the damped update's (. gp)
    product column ([m, 4] SP/YP, see fused.pair_gram_update_pallas)."""
    n = xp.shape[0]
    m = S.shape[0]
    L = fused.LANES
    if not fused.lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned")
    rows = n // L
    if S.shape != (m, rows, L):
        raise ValueError(f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
    nb, br = fused.epilogue_grid(n)
    as2 = lambda v: v.reshape(rows, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # end, nrows (used by the output index maps)
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0)),
            pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, L), lambda i, e, r: (i, 0)),
            pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    import functools

    ncols = 4 if with_gp else 3
    xt, g, S_new, Y_new, acc, SP, YP, fxp = fused.pallas_call32(
        functools.partial(_trial_pair_gram_kernel, with_gp=with_gp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, L), xp.dtype),
            jax.ShapeDtypeStruct((rows, L), xp.dtype),
            jax.ShapeDtypeStruct((m, rows, L), S.dtype),
            jax.ShapeDtypeStruct((m, rows, L), S.dtype),
            jax.ShapeDtypeStruct((1, 5), jnp.float32),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        # inputs counted incl. the prefetch scalars: xp is 3, gp is 5,
        # S is 6, Y is 7.  Aliasing xp->xt and gp->g lets the accepted
        # point land IN PLACE in the while-carry buffers: without it XLA
        # stabilizes the loop carry with two full-vector copies per
        # iteration (trace-measured 2.43 ms/iter at n = 1e8 — the
        # largest single non-kernel cost in the profile).  Callers that
        # still need xp/gp afterwards (non-lean drivers, damping's gp
        # row blend) are protected by XLA's automatic copy insertion.
        input_output_aliases={3: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(
        jnp.asarray([end], jnp.int32),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray([stp], xp.dtype),
        as2(xp),
        as2(d),
        as2(gp),
        S,
        Y,
    )
    a = lambda c: acc[0, c].astype(xp.dtype)
    fx = (fused.obj_reduce(fxp[:, 0], xp.dtype)
          if fused.wide_fx_active() else a(0))
    return (
        xt.reshape(-1), fx, g.reshape(-1), a(1), a(2), a(3),
        acc[0, 4] > 0.0, S_new, Y_new,
        SP.astype(xp.dtype), YP.astype(xp.dtype),
    )


def trial_pair_gram_ok(xp: Array, S: Array) -> bool:
    """Trace-time availability of the fused epilogue (the solver decides
    ``materialize=False`` for the line search before tracing it)."""
    return (
        xp.shape[0] % 2 == 0
        and fused.can_pair_gram_pallas(xp, S)
        and fused._kernel_enabled("trial")
        and _mesh_splits(xp.shape[0])
    )


def trial_pair_gram(xp, d, gp, stp, S, Y, end, with_gp=False):
    """Dispatch the fused epilogue (shard-local under kernels_on_mesh with
    one psum round for the scalar/product accumulators, like pair_gram)."""
    ma = fused.active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        from jax.sharding import PartitionSpec as P

        mesh, ax = ma

        def local(stp_, end_, xp_, d_, gp_, S_, Y_):
            (xt, fx, g, dg, gg, xx, changed, S_new, Y_new, SP, YP) = (
                trial_pair_gram_pallas(
                    xp_, d_, gp_, stp_[0], S_, Y_, end_[0],
                    interpret=fused.interpret_mode(), with_gp=with_gp,
                )
            )
            # fx psums separately: f64 under wide_fx
            part = jnp.stack([dg, gg, xx, changed.astype(dg.dtype)])
            return (
                xt, g, S_new, Y_new,
                jax.lax.psum(fx, ax),
                jax.lax.psum(part, ax),
                jax.lax.psum(SP, ax),
                jax.lax.psum(YP, ax),
            )

        vec, hist, rep = P(ax), P(None, ax, None), P()
        xt, g, S_new, Y_new, fx, part, SP, YP = fused._shard_map(
            local, mesh,
            (rep, rep, vec, vec, vec, hist, hist),
            (vec, vec, hist, hist, rep, rep, rep, rep),
        )(
            jnp.asarray([stp], xp.dtype), jnp.asarray([end], jnp.int32),
            xp, d, gp, S, Y,
        )
        return (
            xt, fx, g, part[0], part[1], part[2], part[3] > 0.0,
            S_new, Y_new, SP, YP,
        )
    return trial_pair_gram_pallas(
        xp, d, gp, stp, S, Y, end, interpret=fused.interpret_mode(),
        with_gp=with_gp,
    )


value_and_grad.__lbfgs_trial_pair_gram__ = trial_pair_gram
value_and_grad.__lbfgs_trial_pair_gram_ok__ = trial_pair_gram_ok


def initial_point(n: int, dtype=jnp.float64) -> Array:
    """x0 alternating (-1.2, 1.0) (``examples/sample.rs:13-17``)."""
    x = jnp.zeros((n,), dtype)
    x = x.at[0::2].set(-1.2)
    x = x.at[1::2].set(1.0)
    return x


# ---------------------------------------------------------------------------
# Fused direction combine + next-iteration first probe
# (the __lbfgs_combine_probe__ protocol)
# ---------------------------------------------------------------------------
#
# The compact two-loop's combine pass produces the NEXT search direction
# d_new = gamma_eff*g + coef_s@S + coef_y@Y; the next line search's FIRST
# evaluation is f(x + stp*d_new) with stp = min(max_step, ||d||)/||d||,
# which is exactly 1.0 whenever ||d|| <= max_step (always, at the default
# max_step = 1e20).  This kernel therefore evaluates the stp=1 trial
# SPECULATIVELY inside the combine pass: xt = x + d_new per block (the
# objective is lane-local), accumulating (ft, dgt) alongside the
# combine's own (||r||^2, r.g) byproducts.  The solver carries the two
# scalars into the next iteration (SolverState.probe1) and the search
# uses them for its first trip iff its entry step is exactly 1.0 —
# otherwise they are dead weight of one discarded scalar pair.
# Removes one whole kernel launch + an 8n-byte probe pass per iteration
# from the More-Thuente/backtracking remat hot path.
#
# Reference semantics: the combine is src/lbfgs.rs:569-604's output step;
# the probe is take_line_step + evaluate (src/core.rs:119-132, 155-164)
# at the first trial of the next search (src/line.rs:258-290).


def _combine_probe_kernel(
    gamma_ref, nrows_ref, cs_ref, cy_ref, g_ref, x_ref, S_ref, Y_ref,
    r_ref, acc_ref, fxp_ref
):
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        for c in range(4):
            acc_ref[0, c] = jnp.float32(0.0)

    gv = g_ref[:]
    # four interleaved accumulation chains, like fused._combine_kernel
    acc = fused._chained_combination(gv.dtype, m, cs_ref, cy_ref, S_ref, Y_ref)
    acc = gamma_ref[0] * gv + acc
    r_ref[:] = acc

    # speculative stp=1 trial of the NEXT search: xt = x + d_new
    xt = x_ref[:] + acc
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    even = (cols % 2) == 0
    x_next = jnp.roll(xt, -1, axis=1)
    t1 = 1.0 - xt
    t2 = 10.0 * (x_next - xt * xt)
    go = 20.0 * t2
    ge = -2.0 * (xt * go + t1)
    gt = jnp.where(even, ge, jnp.roll(go, 1, axis=1))

    is_tail = (i + 1) * R > nrows_ref[0]

    def accumulate(msum, esum):
        acc_ref[0, 0] += msum(acc * acc)   # ||r||^2
        acc_ref[0, 1] += msum(acc * gv)    # r . g  (dginit, sign in gamma)
        bft = esum(t1 * t1 + t2 * t2)
        acc_ref[0, 2] += bft               # f(x + d)
        fxp_ref[i, 0] = bft                # block partial (wide-fx)
        acc_ref[0, 3] += msum(gt * acc)    # g(x + d) . d

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        accumulate(
            lambda a: jnp.sum(jnp.where(valid, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & valid, a, 0.0)),
        )


def combine_probe_pallas(g, x, S, Y, gamma, coef_s, coef_y, interpret=False):
    """Direction combine + speculative stp=1 probe in one pass.

    Returns (r, ||r||^2, r . g, f(x + r), g(x + r) . r).  ``g`` is the
    two-loop input with the -1 sign folded into ``gamma`` (solver
    ``neg=True`` convention), so ``r`` IS the next direction and
    ``r . g`` is the next dginit."""
    n = g.shape[0]
    m = S.shape[0]
    L = fused.LANES
    if not fused.lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned")
    rows = n // L
    if S.shape != (m, rows, L):
        raise ValueError(f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
    nb, br = fused.epilogue_grid(n)
    vblk = lambda: pl.BlockSpec((br, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hblk = lambda: pl.BlockSpec((m, br, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    r, acc, fxp = fused.pallas_call32(
        _combine_probe_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vblk(),
            vblk(),
            hblk(),
            hblk(),
        ],
        out_specs=(vblk(), pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, L), g.dtype),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray([gamma], g.dtype),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray(coef_s, g.dtype),
        jnp.asarray(coef_y, g.dtype),
        g.reshape(rows, L),
        x.reshape(rows, L),
        S,
        Y,
    )
    a = lambda c: acc[0, c].astype(g.dtype)
    ft = (fused.obj_reduce(fxp[:, 0], g.dtype)
          if fused.wide_fx_active() else a(2))
    return r.reshape(-1), a(0), a(1), ft, a(3)


def combine_probe_ref(g, x, S, Y, gamma, coef_s, coef_y):
    """jnp oracle ([m, n] history inputs)."""
    r = fused.combine_ref(g, S, Y, gamma, coef_s, coef_y)
    xt = x + r
    ft, gt = value_and_grad(xt)
    return r, jnp.dot(r, r), jnp.dot(r, g), ft, jnp.dot(gt, r)


def combine_probe(g, x, S, Y, gamma, coef_s, coef_y):
    """Dispatch (shard-local + one psum under kernels_on_mesh)."""
    ma = fused.active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        from jax.sharding import PartitionSpec as P

        mesh, ax = ma

        def local(gamma_, cs_, cy_, g_, x_, S_, Y_):
            r, rr, rd, ft, dgt = combine_probe_pallas(
                g_, x_, S_, Y_, gamma_[0], cs_, cy_,
                interpret=fused.interpret_mode(),
            )
            # ft psums separately: f64 under wide_fx
            part = jax.lax.psum(jnp.stack([rr, rd, dgt]), ax)
            return r, jax.lax.psum(ft, ax), part

        vec, hist, rep = P(ax), P(None, ax, None), P()
        r, ft, part = fused._shard_map(
            local, mesh, (rep, rep, rep, vec, vec, hist, hist), (vec, rep, rep)
        )(
            jnp.asarray([gamma], g.dtype),
            jnp.asarray(coef_s, g.dtype),
            jnp.asarray(coef_y, g.dtype),
            g, x, S, Y,
        )
        return r, part[0], part[1], ft, part[2]
    return combine_probe_pallas(
        g, x, S, Y, gamma, coef_s, coef_y, interpret=fused.interpret_mode()
    )


def combine_probe_ok(x, S) -> bool:
    """Trace-time availability (mirrors trial_pair_gram_ok: the probe part
    needs the pair-local objective, the combine part the ring-major
    history)."""
    return (
        x.shape[0] % 2 == 0
        and fused.can_combine_pallas(x, S)
        and fused._kernel_enabled("combine_probe")
        and _mesh_splits(x.shape[0])
    )


value_and_grad.__lbfgs_combine_probe__ = combine_probe
value_and_grad.__lbfgs_combine_probe_ok__ = combine_probe_ok


# ---------------------------------------------------------------------------
# OWL-QN: combine + in-pass direction constraint + speculative first probe
# (the __lbfgs_combine_ow_probe__ protocol)
# ---------------------------------------------------------------------------
#
# The OWL-QN analog of __lbfgs_combine_probe__: the combine pass applies
# the direction constraint (fused.combine_ow_pallas semantics) AND
# evaluates the next Armijo search's stp=1 first trial speculatively:
#   wp = choose_orthant(x, pg)            (src/core.rs:167-180, full vector)
#   xt = project(x + rc, wp) inside [start, end)   (src/core.rs:155-164)
#   ft = f(xt) + c * sum |xt[window]|,  dgt = g(xt) . rc
# With the unconstrained step policy the OW search's entry step is always
# exactly 1.0, so the speculation replaces the first OW probe (a 12n-byte
# xp/d/wp read) every iteration.


def _combine_ow_probe_kernel(
    gamma_ref, nrows_ref, lohi_ref, cs_ref, cy_ref, pg_ref, x_ref, S_ref, Y_ref,
    r_ref, acc_ref, fxp_ref
):
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        for c in range(6):
            acc_ref[0, c] = jnp.float32(0.0)

    pg = pg_ref[:]
    xv = x_ref[:]
    acc = fused._chained_combination(pg.dtype, m, cs_ref, cy_ref, S_ref, Y_ref)
    acc = gamma_ref[0] * pg + acc

    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = (i * R + rows) * L + cols
    in_win = (gidx >= lohi_ref[0]) & (gidx < lohi_ref[1])
    # direction constraint vs -pg (src/orthantwise.rs:140-161)
    kill = in_win & (msign(acc) != msign(-pg))
    rc = jnp.where(kill, jnp.zeros_like(acc), acc)
    r_ref[:] = rc

    # speculative stp=1 OW trial: orthant from (x, pg), project in-window
    wp = jnp.where(xv == 0.0, msign(-pg), msign(xv))
    xr = xv + rc
    projected = jnp.where(msign(xr) != msign(wp), jnp.zeros_like(xr), xr)
    xt = jnp.where(in_win, projected, xr)

    even = (cols % 2) == 0
    x_next = jnp.roll(xt, -1, axis=1)
    t1 = 1.0 - xt
    t2 = 10.0 * (x_next - xt * xt)
    go = 20.0 * t2
    ge = -2.0 * (xt * go + t1)
    gt = jnp.where(even, ge, jnp.roll(go, 1, axis=1))

    is_tail = (i + 1) * R > nrows_ref[0]

    def accumulate(msum, esum):
        acc_ref[0, 0] += msum(acc * acc)   # ||r||^2 pre-constrain
        acc_ref[0, 1] += msum(rc * rc)     # ||rc||^2
        acc_ref[0, 2] += msum(rc * pg)     # rc . pg (next dginit)
        bft = esum(t1 * t1 + t2 * t2)
        bl1 = msum(jnp.where(in_win, jnp.abs(xt), 0.0))
        acc_ref[0, 3] += bft               # f(xt)
        acc_ref[0, 4] += bl1               # L1
        fxp_ref[i, 0] = bft                # block partials (wide-fx)
        fxp_ref[i, 1] = bl1
        acc_ref[0, 5] += msum(gt * rc)     # g(xt) . rc

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum, lambda a: jnp.sum(jnp.where(even, a, 0.0)))

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        accumulate(
            lambda a: jnp.sum(jnp.where(valid, a, 0.0)),
            lambda a: jnp.sum(jnp.where(even & valid, a, 0.0)),
        )


def combine_ow_probe_pallas(pg, x, S, Y, gamma, coef_s, coef_y, c, start, end,
                            interpret: bool = False):
    """Returns (rc, rr_pre, rc2, rcd, ft_incl_L1, dgt)."""
    n = pg.shape[0]
    m = S.shape[0]
    L = fused.LANES
    if not fused.lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned")
    rows = n // L
    if S.shape != (m, rows, L):
        raise ValueError(f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
    nb, br = fused.epilogue_grid(n)
    vblk = lambda: pl.BlockSpec((br, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hblk = lambda: pl.BlockSpec((m, br, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    r, acc, fxp = fused.pallas_call32(
        _combine_ow_probe_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vblk(),
            vblk(),
            hblk(),
            hblk(),
        ],
        out_specs=(vblk(), pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, L), pg.dtype),
            jax.ShapeDtypeStruct((1, 6), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray([gamma], pg.dtype),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray([start, end], jnp.int32),
        jnp.asarray(coef_s, pg.dtype),
        jnp.asarray(coef_y, pg.dtype),
        pg.reshape(rows, L),
        x.reshape(rows, L),
        S,
        Y,
    )
    a = lambda j: acc[0, j].astype(pg.dtype)
    if fused.wide_fx_active():
        ft = (fused.obj_reduce(fxp[:, 0], pg.dtype)
              + jnp.float64(c) * fused.obj_reduce(fxp[:, 1], pg.dtype))
    else:
        ft = a(3) + jnp.asarray(c, pg.dtype) * a(4)
    return r.reshape(-1), a(0), a(1), a(2), ft, a(5)


def combine_ow_probe_ref(pg, x, S, Y, gamma, coef_s, coef_y, c, start, end):
    """jnp oracle ([m, n] history inputs)."""
    from ..orthantwise import Orthantwise

    rc, rr, rc2, rcd = fused.combine_ow_ref(
        pg, S, Y, gamma, coef_s, coef_y, start, end
    )
    msign = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    wp = jnp.where(x == 0.0, msign(-pg), msign(x))
    xt, ft, gt, dgt, _, _ = owlqn_trial_ref(x, rc, wp, 1.0, c, start, end)
    return rc, rr, rc2, rcd, ft, dgt


def combine_ow_probe(pg, x, S, Y, gamma, coef_s, coef_y, c, start, end):
    """Dispatch (shard-local + one psum under kernels_on_mesh, with the
    global window translated per shard)."""
    ma = fused.active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        from jax.sharding import PartitionSpec as P

        mesh, ax = ma

        def local(gamma_, cs_, cy_, pg_, x_, S_, Y_):
            off = jax.lax.axis_index(ax) * pg_.shape[0]
            rc, rr, rc2, rcd, ft, dgt = combine_ow_probe_pallas(
                pg_, x_, S_, Y_, gamma_[0], cs_, cy_, c,
                start - off, end - off, interpret=fused.interpret_mode(),
            )
            # ft psums separately: f64 under wide_fx
            part = jax.lax.psum(jnp.stack([rr, rc2, rcd, dgt]), ax)
            return rc, jax.lax.psum(ft, ax), part

        vec, hist, rep = P(ax), P(None, ax, None), P()
        rc, ft, part = fused._shard_map(
            local, mesh, (rep, rep, rep, vec, vec, hist, hist), (vec, rep, rep)
        )(
            jnp.asarray([gamma], pg.dtype),
            jnp.asarray(coef_s, pg.dtype),
            jnp.asarray(coef_y, pg.dtype),
            pg, x, S, Y,
        )
        return rc, part[0], part[1], part[2], ft, part[3]
    return combine_ow_probe_pallas(
        pg, x, S, Y, gamma, coef_s, coef_y, c, start, end,
        interpret=fused.interpret_mode(),
    )


def combine_ow_probe_ok(x, S) -> bool:
    return (
        x.shape[0] % 2 == 0
        and fused.can_combine_pallas(x, S)
        and fused._kernel_enabled("combine_probe")
        and _mesh_splits(x.shape[0])
    )


value_and_grad.__lbfgs_combine_ow_probe__ = combine_ow_probe
value_and_grad.__lbfgs_combine_ow_probe_ok__ = combine_ow_probe_ok
