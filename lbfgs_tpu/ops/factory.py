"""Objective-agnostic fused-kernel factory (``make_fused_objective``).

The reference accepts *any* closure at full speed — its eval boundary is
objective-agnostic (``src/core.rs:119-132``).  The TPU build's big wins
(fused trial/probe, the one-kernel epilogues, combine+probe) were
hand-written for the Rosenbrock flagship in rounds 1-4; this module turns
that hand-written ``__lbfgs_*__`` protocol into a FACTORY: the user
supplies only a per-block objective body

    block_fn(x, gidx, *extra_blocks) -> (fx_elem, g)

where ``x`` is an ``(R, 128)`` f32 block of the iterate, ``gidx`` the
matching ``(R, 128)`` i32 GLOBAL element indices (shard offsets already
applied), and ``extra_blocks`` the same-shaped blocks of any bound
per-element operand streams (weights, targets, ...).  ``fx_elem`` holds
the elementwise objective contributions (already structure-masked so
that ``sum(fx_elem)`` over valid elements is the block's fx partial) and
``g`` the gradient block.  The factory then emits the COMPLETE fused
protocol — trial, probe, OWL-QN trial/probe (incl. the in-register
orthant probe), both one-kernel epilogues (plain + OWL-QN, each with the
damped ``with_gp`` product column), and both combine+probe fusions —
reusing the exact kernel skeletons, tail-masking rules, SMEM accumulator
layouts, ring-write index maps and carry-aliasing of the hand-written
Rosenbrock kernels (``models/rosenbrock.py`` rounds 2-4; that module is
now itself expressed through this factory, trajectory-pinned).

Contract for ``block_fn``:
  * block-local: it sees one ``(R, 128)`` tile at a time; any coupling
    between elements must stay inside a 128-lane row (lane-local rolls
    are fine — rows never split; e.g. Rosenbrock's (2i, 2i+1) pairs).
  * pure f32 math, traceable under the 32-bit kernel context
    (``fused.pallas_call32``) — no python-int promotion surprises.
  * padded/garbage lanes may flow through it (tail blocks); its OUTPUTS
    at invalid lanes are masked by the factory, but it must not produce
    side effects from them (pure jnp math never does).

Sharding: under ``parallel.kernels_on_mesh`` every kernel runs
shard-local via ``jax.shard_map`` with ONE psum for the scalar/product
accumulators; ``gidx`` stays global (the factory folds the shard offset
into the kernel's index base), so index-dependent objectives and the
OWL-QN window work unchanged.

Extra operand streams (``extras``) are bound at factory time and flow
into every kernel as additional VMEM blocks (and into the jnp fallback
paths).  NOTE (relay environments): a bound concrete array becomes an
HLO constant of any jit that closes over the objective — at large n
bind inside your own ``jit`` (pass the arrays as arguments, call
``make_fused_objective`` in the traced function) so they stay operands.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import Array

from . import fused

if fused.HAVE_PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _msign(v):
    return jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))


def make_fused_objective(block_fn, value_and_grad=None, *, extras=(),
                         validate=None):
    """Build a fully-fused objective from a per-block body.

    Args:
      block_fn: ``(x, gidx, *extra_blocks) -> (fx_elem, g)`` — see module
        docstring.
      value_and_grad: optional plain jnp ``x -> (fx, gx)`` used for the
        non-kernel fallback paths and the ``*_ref`` oracles.  When None,
        one is synthesized from ``block_fn`` (lane-padded evaluation).
      extras: tuple of ``[n]`` arrays streamed alongside the iterate into
        every kernel (f32 on the kernel path).
      validate: optional ``validate(n) -> None`` raising on unsupported
        problem sizes (e.g. Rosenbrock's even-n requirement).

    Returns the (possibly synthesized) ``value_and_grad`` callable with
    the complete ``__lbfgs_*__`` protocol attached, plus ``.kernels``, a
    namespace exposing every generated kernel/wrapper/oracle.
    """
    extras = tuple(extras)
    nex = len(extras)

    # ---------------------------------------------------------------- vag
    if value_and_grad is None:
        def value_and_grad(x):
            """Synthesized jnp evaluation: lane-pad, run the block body
            on the whole array as one tile stack, mask, reduce."""
            n = x.shape[0]
            L = fused.LANES
            pad = (-n) % L
            xr = (jnp.pad(x, (0, pad)) if pad else x).reshape(-1, L)
            gidx = jnp.arange(xr.size, dtype=jnp.int32).reshape(xr.shape)
            exb = [
                (jnp.pad(e, (0, pad)) if pad else e).reshape(-1, L)
                for e in extras
            ]
            fx_elem, g = block_fn(xr, gidx, *exb)
            if pad:
                valid = gidx < n
                fx = fused.obj_sum(jnp.where(valid, fx_elem, 0.0).reshape(-1))
                g = g.reshape(-1)[:n]
            else:
                fx = fused.obj_sum(fx_elem.reshape(-1))
                g = g.reshape(-1)
            return fx, g

    vag = value_and_grad

    def _check(n: int) -> None:
        if validate is not None:
            validate(n)

    def _mesh_splits(n: int) -> bool:
        """A mesh shard must get a whole number of 128-lane rows so the
        kernels' tile structure (and any lane-local block coupling)
        stays shard-local."""
        ma = fused.active_mesh()
        if ma is None:
            return True
        return n % (ma[0].devices.size * fused.LANES) == 0

    def _kernel_path(xp, *more) -> bool:
        return (
            fused._use_pallas(xp, *more, *extras)
            and fused._kernel_enabled("trial")
            and xp.shape[0] >= fused.MIN_FUSED_N
            and _mesh_splits(xp.shape[0])
        )

    def _ex_blocks(ex):
        """Extras reshaped like ``fused._to_blocks`` (flat-grid kernels).
        ``ex=None`` uses the bound extras; mesh dispatchers pass the
        shard-local slices explicitly (a closure capture inside shard_map
        would be replicated, not sharded)."""
        return [fused._to_blocks(e)[0] for e in (extras if ex is None else ex)]

    def _ex_rows(rows, ex):
        """Extras reshaped to [rows, 128] (lane-aligned kernels)."""
        return [e.reshape(rows, fused.LANES)
                for e in (extras if ex is None else ex)]

    L = fused.LANES

    # ------------------------------------------------------------------
    # trial: (xt, fx, g, dg, gg, xx, changed) in one pass
    # ------------------------------------------------------------------
    # Skeleton parity: models/rosenbrock _trial_kernel (rounds 2-4); the
    # objective block is the only substitution.  meta = [n, off] (off is
    # the shard's global element offset, folded into the index base).

    def _trial_kernel(*refs):
        scal_ref, meta_ref = refs[0], refs[1]
        xp_ref, d_ref = refs[2], refs[3]
        ex_refs = refs[4:4 + nex]
        xt_ref, g_ref, acc_ref, fxp_ref = refs[4 + nex:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for c in range(5):
                acc_ref[0, c] = jnp.float32(0.0)

        stp = scal_ref[0]
        n, off = meta_ref[0], meta_ref[1]
        xp = xp_ref[:]
        dd = d_ref[:]
        x = xp + stp * dd
        xt_ref[:] = x
        R, Lc = x.shape
        base = i * R * Lc
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        lidx = base + rows * Lc + cols
        fx_elem, g = block_fn(x, off + lidx, *(r[:] for r in ex_refs))
        g_ref[:] = g

        def accumulate(msum):
            bfx = msum(fx_elem)
            acc_ref[0, 0] += bfx                                        # fx
            fxp_ref[i, 0] = bfx     # per-block partial (wide-fx reduce)
            acc_ref[0, 1] += msum(g * dd)                               # dg
            acc_ref[0, 2] += msum(g * g)                                # gg
            acc_ref[0, 3] += msum(x * x)                                # xx
            acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))

        is_tail = base + R * Lc > n

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            in_arr = lidx < n
            accumulate(lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)))

    def trial_pallas(xp: Array, d: Array, stp, interpret: bool = False,
                     off=0, ex=None):
        """One-pass fused trial — the generic form of the
        ``__lbfgs_trial__`` protocol (see ``linesearch._trial``)."""
        n = xp.shape[0]
        nblk = 4 + nex  # xp, d(+extras) in; xt, g out
        xp2, nb, BR = fused._to_blocks(xp, nblk=nblk)
        d2, _, _ = fused._to_blocks(d, nblk=nblk)
        scal = jnp.asarray([stp], xp.dtype)
        meta = jnp.stack([jnp.asarray(n, jnp.int32),
                          jnp.asarray(off, jnp.int32)])
        blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        xt, g, acc, fxp = fused.pallas_call32(
            _trial_kernel,
            grid=(nb,),
            in_specs=[smem(), smem(), blk(), blk()] + [blk()] * nex,
            out_specs=(blk(), blk(), smem(), smem()),
            out_shape=(
                jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
                jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
                jax.ShapeDtypeStruct((1, 5), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ),
            interpret=interpret,
        )(scal, meta, xp2, d2, *_ex_blocks(ex))
        a = lambda c: acc[0, c].astype(xp.dtype)
        fx = (fused.obj_reduce(fxp[:, 0], xp.dtype)
              if fused.wide_fx_active() else a(0))
        return (xt.reshape(-1)[:n], fx, g.reshape(-1)[:n],
                a(1), a(2), a(3), acc[0, 4] > 0.0)

    def trial_ref(xp, d, stp):
        """jnp fallback of the fused trial (also the test oracle)."""
        from . import vecmath as vm

        xt = xp + stp * d
        fx, g = vag(xt)
        return (xt, fx, g, vm.dot(g, d), vm.dot(g, g), vm.dot(xt, xt),
                jnp.any(xt != xp))

    def trial(xp, d, stp):
        _check(xp.shape[0])
        if _kernel_path(xp, d):
            ma = fused.active_mesh()
            if ma is not None and ma[0].devices.size > 1:
                from jax.sharding import PartitionSpec as P

                mesh, ax = ma

                def local(stp_, xp_, d_, *ex_):
                    off = jax.lax.axis_index(ax) * xp_.shape[0]
                    xt, fx, g, dg, gg, xx, changed = ns.trial_pallas(
                        xp_, d_, stp_[0], interpret=fused.interpret_mode(),
                        off=off, ex=ex_,
                    )
                    # fx psums separately: f64 under wide_fx
                    part = jnp.stack([dg, gg, xx, changed.astype(dg.dtype)])
                    return xt, g, jax.lax.psum(fx, ax), jax.lax.psum(part, ax)

                xt, g, fx, part = fused._shard_map(
                    local, mesh, (P(), P(ax), P(ax)) + (P(ax),) * nex,
                    (P(ax), P(ax), P(), P())
                )(jnp.asarray([stp], xp.dtype), xp, d, *extras)
                return xt, fx, g, part[0], part[1], part[2], part[3] > 0.0
            return ns.trial_pallas(xp, d, stp, interpret=fused.interpret_mode())
        return trial_ref(xp, d, stp)

    # ------------------------------------------------------------------
    # probe: (ft, dg) only — zero vector writes
    # ------------------------------------------------------------------

    def _probe_kernel(*refs):
        scal_ref, meta_ref = refs[0], refs[1]
        xp_ref, d_ref = refs[2], refs[3]
        ex_refs = refs[4:4 + nex]
        acc_ref, fxp_ref = refs[4 + nex:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for c in range(2):
                acc_ref[0, c] = jnp.float32(0.0)

        stp = scal_ref[0]
        n, off = meta_ref[0], meta_ref[1]
        xp = xp_ref[:]
        dd = d_ref[:]
        x = xp + stp * dd
        R, Lc = x.shape
        base = i * R * Lc
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        lidx = base + rows * Lc + cols
        fx_elem, g = block_fn(x, off + lidx, *(r[:] for r in ex_refs))

        def accumulate(msum):
            bfx = msum(fx_elem)
            acc_ref[0, 0] += bfx
            fxp_ref[i, 0] = bfx
            acc_ref[0, 1] += msum(g * dd)

        is_tail = base + R * Lc > n

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            in_arr = lidx < n
            accumulate(lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)))

    def probe_pallas(xp, d, stp, interpret: bool = False, off=0, ex=None):
        """(ft, dg) of one trial with zero vector writes."""
        n = xp.shape[0]
        nblk = 2 + nex  # xp, d(+extras) in; scalar outs only
        xp2, nb, BR = fused._to_blocks(xp, nblk=nblk)
        d2, _, _ = fused._to_blocks(d, nblk=nblk)
        scal = jnp.asarray([stp], xp.dtype)
        meta = jnp.stack([jnp.asarray(n, jnp.int32),
                          jnp.asarray(off, jnp.int32)])
        blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        acc, fxp = fused.pallas_call32(
            _probe_kernel,
            grid=(nb,),
            in_specs=[smem(), smem(), blk(), blk()] + [blk()] * nex,
            out_specs=(smem(), smem()),
            out_shape=(jax.ShapeDtypeStruct((1, 2), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1), jnp.float32)),
            interpret=interpret,
        )(scal, meta, xp2, d2, *_ex_blocks(ex))
        ft = (fused.obj_reduce(fxp[:, 0], xp.dtype)
              if fused.wide_fx_active() else acc[0, 0].astype(xp.dtype))
        return ft, acc[0, 1].astype(xp.dtype)

    def probe_ref(xp, d, stp):
        from . import vecmath as vm

        xt = xp + stp * d
        fx, g = vag(xt)
        return fx, vm.dot(g, d)

    def probe(xp, d, stp):
        _check(xp.shape[0])
        if _kernel_path(xp, d):
            ma = fused.active_mesh()
            if ma is not None and ma[0].devices.size > 1:
                from jax.sharding import PartitionSpec as P

                mesh, ax = ma

                def local(stp_, xp_, d_, *ex_):
                    off = jax.lax.axis_index(ax) * xp_.shape[0]
                    ft, dg = ns.probe_pallas(
                        xp_, d_, stp_[0], interpret=fused.interpret_mode(),
                        off=off, ex=ex_,
                    )
                    return jax.lax.psum(ft, ax), jax.lax.psum(dg, ax)

                return fused._shard_map(
                    local, mesh, (P(), P(ax), P(ax)) + (P(ax),) * nex,
                    (P(), P())
                )(jnp.asarray([stp], xp.dtype), xp, d, *extras)
            return ns.probe_pallas(xp, d, stp, interpret=fused.interpret_mode())
        return probe_ref(xp, d, stp)

    # ------------------------------------------------------------------
    # OWL-QN trial / probe (projection + objective + windowed L1)
    # ------------------------------------------------------------------
    # meta = [n, off, lo, hi]; the window stays GLOBAL (compared against
    # off + lidx), equivalent to the per-shard translation the
    # hand-written kernels used.

    def _ow_point(xp, dd, wp, stp, in_win):
        xr = xp + stp * dd
        projected = jnp.where(_msign(xr) != _msign(wp), jnp.zeros_like(xr), xr)
        return jnp.where(in_win, projected, xr)

    def _owlqn_trial_kernel(*refs):
        scal_ref, meta_ref = refs[0], refs[1]
        xp_ref, d_ref, wp_ref = refs[2], refs[3], refs[4]
        ex_refs = refs[5:5 + nex]
        xt_ref, g_ref, acc_ref, fxp_ref = refs[5 + nex:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for c in range(5):
                acc_ref[0, c] = jnp.float32(0.0)

        stp = scal_ref[0]
        n, off, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2], meta_ref[3]
        xp = xp_ref[:]
        dd = d_ref[:]
        wp = wp_ref[:]
        R, Lc = xp.shape
        base = i * R * Lc
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        lidx = base + rows * Lc + cols
        gidx = off + lidx
        in_win = (gidx >= lo) & (gidx < hi)
        x = _ow_point(xp, dd, wp, stp, in_win)
        xt_ref[:] = x
        fx_elem, g = block_fn(x, gidx, *(r[:] for r in ex_refs))
        g_ref[:] = g

        def accumulate(msum):
            bfx = msum(fx_elem)
            bl1 = msum(jnp.where(in_win, jnp.abs(x), 0.0))
            acc_ref[0, 0] += bfx                                  # raw fx
            acc_ref[0, 1] += bl1                                  # |x| window
            fxp_ref[i, 0] = bfx
            fxp_ref[i, 1] = bl1
            acc_ref[0, 2] += msum(g * dd)                         # dg
            acc_ref[0, 3] += msum(x * x)                          # xx
            acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))

        is_tail = base + R * Lc > n

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            in_arr = lidx < n
            accumulate(lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)))

    def _owlqn_fx(acc, fxp, c, vdtype):
        """fx + c*L1 from the kernel scalars (wide-fx f64 partials, else
        the SMEM accumulators — bitwise-unchanged default path)."""
        if fused.wide_fx_active():
            fx = fused.obj_reduce(fxp[:, 0], vdtype)
            l1 = fused.obj_reduce(fxp[:, 1], vdtype)
            return fused.obj_axpy(c, l1, fx)
        a = lambda j: acc[0, j].astype(vdtype)
        return a(0) + jnp.asarray(c, vdtype) * a(1)

    def _ow_meta(n, off, lo, hi):
        return jnp.stack([
            jnp.asarray(n, jnp.int32), jnp.asarray(off, jnp.int32),
            jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32),
        ])

    def owlqn_trial_pallas(xp, d, wp, stp, c, start, end,
                           interpret: bool = False, off=0, ex=None):
        """(xt, fx_incl_L1, g, dg, xx, changed) in one pass."""
        n = xp.shape[0]
        nblk = 5 + nex  # xp, d, wp(+extras) in; xt, g out
        xp2, nb, BR = fused._to_blocks(xp, nblk=nblk)
        d2, _, _ = fused._to_blocks(d, nblk=nblk)
        wp2, _, _ = fused._to_blocks(wp, nblk=nblk)
        scal = jnp.asarray([stp], xp.dtype)
        meta = _ow_meta(n, off, start, end)
        blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        xt, g, acc, fxp = fused.pallas_call32(
            _owlqn_trial_kernel,
            grid=(nb,),
            in_specs=[smem(), smem(), blk(), blk(), blk()] + [blk()] * nex,
            out_specs=(blk(), blk(), smem(), smem()),
            out_shape=(
                jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
                jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
                jax.ShapeDtypeStruct((1, 5), jnp.float32),
                jax.ShapeDtypeStruct((nb, 2), jnp.float32),
            ),
            interpret=interpret,
        )(scal, meta, xp2, d2, wp2, *_ex_blocks(ex))
        a = lambda j: acc[0, j].astype(xp.dtype)
        ft = _owlqn_fx(acc, fxp, c, xp.dtype)
        return (xt.reshape(-1)[:n], ft, g.reshape(-1)[:n],
                a(2), a(3), acc[0, 4] > 0.0)

    def _owlqn_probe_body(*refs, wp_is_pg: bool):
        scal_ref, meta_ref = refs[0], refs[1]
        xp_ref, d_ref, w_ref = refs[2], refs[3], refs[4]
        ex_refs = refs[5:5 + nex]
        acc_ref, fxp_ref = refs[5 + nex:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for c in range(3):
                acc_ref[0, c] = jnp.float32(0.0)

        stp = scal_ref[0]
        n, off, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2], meta_ref[3]
        xp = xp_ref[:]
        dd = d_ref[:]
        if wp_is_pg:
            # orthant IN-REGISTER from (xp, pg_old): bitwise-identical to
            # the search's choose_orthant (src/core.rs:167-180) — removes
            # the per-search materialized-orthant vector pass
            pgo = w_ref[:]
            wp = jnp.where(xp == 0.0, _msign(-pgo), _msign(xp))
        else:
            wp = w_ref[:]
        R, Lc = xp.shape
        base = i * R * Lc
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        lidx = base + rows * Lc + cols
        gidx = off + lidx
        in_win = (gidx >= lo) & (gidx < hi)
        x = _ow_point(xp, dd, wp, stp, in_win)
        fx_elem, g = block_fn(x, gidx, *(r[:] for r in ex_refs))

        def accumulate(msum):
            bfx = msum(fx_elem)
            bl1 = msum(jnp.where(in_win, jnp.abs(x), 0.0))
            acc_ref[0, 0] += bfx
            acc_ref[0, 1] += bl1
            fxp_ref[i, 0] = bfx
            fxp_ref[i, 1] = bl1
            acc_ref[0, 2] += msum(g * dd)

        is_tail = base + R * Lc > n

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            in_arr = lidx < n
            accumulate(lambda a: jnp.sum(jnp.where(in_arr, a, 0.0)))

    _owlqn_probe_kernel = functools.partial(_owlqn_probe_body, wp_is_pg=False)
    _owlqn_probe_pg_kernel = functools.partial(_owlqn_probe_body, wp_is_pg=True)

    def _ow_probe_call(kernel, xp, d, w, stp, c, start, end, interpret, off,
                       ex):
        n = xp.shape[0]
        nblk = 3 + nex  # xp, d, wp-or-pg(+extras) in; scalar outs only
        xp2, nb, BR = fused._to_blocks(xp, nblk=nblk)
        d2, _, _ = fused._to_blocks(d, nblk=nblk)
        w2, _, _ = fused._to_blocks(w, nblk=nblk)
        scal = jnp.asarray([stp], xp.dtype)
        meta = _ow_meta(n, off, start, end)
        blk = lambda: pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        acc, fxp = fused.pallas_call32(
            kernel,
            grid=(nb,),
            in_specs=[smem(), smem(), blk(), blk(), blk()] + [blk()] * nex,
            out_specs=(smem(), smem()),
            out_shape=(jax.ShapeDtypeStruct((1, 3), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 2), jnp.float32)),
            interpret=interpret,
        )(scal, meta, xp2, d2, w2, *_ex_blocks(ex))
        return _owlqn_fx(acc, fxp, c, xp.dtype), acc[0, 2].astype(xp.dtype)

    def owlqn_probe_pallas(xp, d, wp, stp, c, start, end,
                           interpret: bool = False, off=0, ex=None):
        """(ft_incl_L1, dg) of one OWL-QN trial, zero vector writes."""
        return _ow_probe_call(_owlqn_probe_kernel, xp, d, wp, stp, c,
                              start, end, interpret, off, ex)

    def owlqn_probe_pg_pallas(xp, d, pg, stp, c, start, end,
                              interpret: bool = False, off=0, ex=None):
        """(ft_incl_L1, dg), orthant recomputed in-register from pg."""
        return _ow_probe_call(_owlqn_probe_pg_kernel, xp, d, pg, stp, c,
                              start, end, interpret, off, ex)

    def owlqn_trial_ref(xp, d, wp, stp, c, start, end):
        """jnp fallback of the fused OWL-QN trial (also the test oracle)."""
        from . import vecmath as vm

        xt = fused.owlqn_trial_step_ref(xp, d, wp, stp, start, end)
        fx, g = vag(xt)
        idx = jnp.arange(xt.shape[0], dtype=jnp.int32)
        l1 = fused.obj_sum(
            jnp.where((idx >= start) & (idx < end), jnp.abs(xt), 0.0)
        )
        return (xt, fused.obj_axpy(c, l1, fx), g, vm.dot(g, d),
                vm.dot(xt, xt), jnp.any(xt != xp))

    def owlqn_probe_ref(xp, d, wp, stp, c, start, end):
        res = owlqn_trial_ref(xp, d, wp, stp, c, start, end)
        return res[1], res[3]

    def owlqn_probe_pg_ref(xp, d, pg, stp, c, start, end):
        from .. import orthantwise as ow_ops
        from ..orthantwise import Orthantwise

        wp = ow_ops.choose_orthant(Orthantwise(c=c, start=start, end=end),
                                   xp, pg)
        return owlqn_probe_ref(xp, d, wp, stp, c, start, end)

    def _owlqn_dispatch(xp, d, w, stp, c, start, end, single, ref):
        _check(xp.shape[0])
        if _kernel_path(xp, d, w):
            ma = fused.active_mesh()
            if ma is not None and ma[0].devices.size > 1:
                return None  # caller handles the shard_map wrap
            return single(xp, d, w, stp, c, start, end,
                          interpret=fused.interpret_mode())
        return ref(xp, d, w, stp, c, start, end)

    def _ow_scalar_mesh(single, xp, d, w, stp, c, start, end):
        from jax.sharding import PartitionSpec as P

        mesh, ax = fused.active_mesh()

        def local(stp_, xp_, d_, w_, *ex_):
            off = jax.lax.axis_index(ax) * xp_.shape[0]
            ft, dg = single(xp_, d_, w_, stp_[0], c, start, end,
                            interpret=fused.interpret_mode(), off=off, ex=ex_)
            return jax.lax.psum(ft, ax), jax.lax.psum(dg, ax)

        return fused._shard_map(
            local, mesh, (P(), P(ax), P(ax), P(ax)) + (P(ax),) * nex,
            (P(), P())
        )(jnp.asarray([stp], xp.dtype), xp, d, w, *extras)

    def owlqn_trial(xp, d, wp, stp, c, start, end):
        out = _owlqn_dispatch(xp, d, wp, stp, c, start, end,
                              ns.owlqn_trial_pallas, owlqn_trial_ref)
        if out is not None:
            return out
        from jax.sharding import PartitionSpec as P

        mesh, ax = fused.active_mesh()

        def local(stp_, xp_, d_, wp_, *ex_):
            off = jax.lax.axis_index(ax) * xp_.shape[0]
            xt, ft, g, dg, xx, changed = ns.owlqn_trial_pallas(
                xp_, d_, wp_, stp_[0], c, start, end,
                interpret=fused.interpret_mode(), off=off, ex=ex_,
            )
            # ft psums separately: f64 under wide_fx
            part = jnp.stack([dg, xx, changed.astype(dg.dtype)])
            return xt, g, jax.lax.psum(ft, ax), jax.lax.psum(part, ax)

        xt, g, ft, part = fused._shard_map(
            local, mesh, (P(), P(ax), P(ax), P(ax)) + (P(ax),) * nex,
            (P(ax), P(ax), P(), P())
        )(jnp.asarray([stp], xp.dtype), xp, d, wp, *extras)
        return xt, ft, g, part[0], part[1], part[2] > 0.0

    def owlqn_probe(xp, d, wp, stp, c, start, end):
        out = _owlqn_dispatch(xp, d, wp, stp, c, start, end,
                              ns.owlqn_probe_pallas, owlqn_probe_ref)
        if out is not None:
            return out
        return _ow_scalar_mesh(ns.owlqn_probe_pallas, xp, d, wp, stp, c,
                               start, end)

    def owlqn_probe_pg(xp, d, pg, stp, c, start, end):
        out = _owlqn_dispatch(xp, d, pg, stp, c, start, end,
                              ns.owlqn_probe_pg_pallas, owlqn_probe_pg_ref)
        if out is not None:
            return out
        return _ow_scalar_mesh(ns.owlqn_probe_pg_pallas, xp, d, pg, stp, c,
                               start, end)

    ns = SimpleNamespace(
        value_and_grad=vag,
        mesh_splits=_mesh_splits,
        trial_pallas=trial_pallas, trial_ref=trial_ref, trial=trial,
        probe_pallas=probe_pallas, probe_ref=probe_ref, probe=probe,
        owlqn_trial_pallas=owlqn_trial_pallas,
        owlqn_trial_ref=owlqn_trial_ref, owlqn_trial=owlqn_trial,
        owlqn_probe_pallas=owlqn_probe_pallas,
        owlqn_probe_ref=owlqn_probe_ref, owlqn_probe=owlqn_probe,
        owlqn_probe_pg_pallas=owlqn_probe_pg_pallas,
        owlqn_probe_pg_ref=owlqn_probe_pg_ref, owlqn_probe_pg=owlqn_probe_pg,
    )
    _attach_epilogues(ns, block_fn, vag, extras, nex, _check, _mesh_splits,
                      _ex_rows)
    _attach_combines(ns, block_fn, vag, extras, nex, _check, _mesh_splits,
                     _ex_rows)

    vag.__lbfgs_value_and_grad__ = True
    vag.__lbfgs_trial__ = ns.trial
    vag.__lbfgs_trial_probe__ = ns.probe
    vag.__lbfgs_owlqn_trial__ = ns.owlqn_trial
    vag.__lbfgs_owlqn_probe__ = ns.owlqn_probe
    vag.__lbfgs_owlqn_probe_pg__ = ns.owlqn_probe_pg
    vag.__lbfgs_trial_pair_gram__ = ns.trial_pair_gram
    vag.__lbfgs_trial_pair_gram_ok__ = ns.trial_pair_gram_ok
    vag.__lbfgs_owlqn_trial_pair_gram__ = ns.owlqn_trial_pair_gram
    vag.__lbfgs_owlqn_trial_pair_gram_ok__ = ns.owlqn_trial_pair_gram_ok
    vag.__lbfgs_combine_probe__ = ns.combine_probe
    vag.__lbfgs_combine_probe_ok__ = ns.combine_probe_ok
    vag.__lbfgs_combine_ow_probe__ = ns.combine_ow_probe
    vag.__lbfgs_combine_ow_probe_ok__ = ns.combine_ow_probe_ok
    vag.kernels = ns
    return vag


# ---------------------------------------------------------------------------
# One-kernel epilogues (trial+pair+Gram; OWL-QN trial+pg+pair+Gram)
# ---------------------------------------------------------------------------


def _attach_epilogues(ns, block_fn, vag, extras, nex, _check, _mesh_splits,
                      _ex_rows):
    """Generate the fused-epilogue protocols onto ``ns``.

    Skeleton parity: models/rosenbrock ``_trial_pair_gram_kernel`` /
    ``_owlqn_tpg_kernel`` (rounds 2-4) — in-place carry aliasing
    (xp->x, gp->g, pg->pg_new, S/Y ring rows), SMEM [m, 3|4] Gram
    accumulators, row-masked cdiv tails, scalar-prefetch ring index.
    """
    L = fused.LANES

    def _trial_pair_gram_kernel(*refs, with_gp=False):
        # prefetch: end, nrows; then scal [stp], meta [off],
        # xp, d, gp, *extras, S, Y; outs xt, g, s, y, acc, sp, yp, fxp
        end_ref, nrows_ref, scal_ref, meta_ref = refs[:4]
        xp_ref, d_ref, gp_ref = refs[4], refs[5], refs[6]
        ex_refs = refs[7:7 + nex]
        S_ref, Y_ref = refs[7 + nex], refs[8 + nex]
        (xt_ref, g_ref, s_ref, y_ref, acc_ref, sp_ref, yp_ref,
         fxp_ref) = refs[9 + nex:]
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
        stp = scal_ref[0]
        off = meta_ref[0]
        xp = xp_ref[:]
        dd = d_ref[:]
        gpv = gp_ref[:]
        x = xp + stp * dd
        xt_ref[:] = x
        R, Lc = x.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        gidx = off + (i * jnp.int32(R) + rows) * jnp.int32(Lc) + cols
        fx_elem, g = block_fn(x, gidx, *(r[:] for r in ex_refs))
        g_ref[:] = g

        # correction pair in place into ring row `end` (s = stp*d exactly
        # on the projection-free path, src/core.rs:155-164)
        s = stp * dd
        y = g - gpv
        d0 = -g
        s_ref[0] = s.astype(s_ref.dtype)
        y_ref[0] = y.astype(y_ref.dtype)

        def acc_all(msum):
            bfx = msum(fx_elem)
            acc_ref[0, 0] += bfx                                  # fx
            fxp_ref[i, 0] = bfx                                   # partial
            acc_ref[0, 1] += msum(g * dd)                         # dg
            acc_ref[0, 2] += msum(g * g)                          # gg
            acc_ref[0, 3] += msum(x * x)                          # xx
            acc_ref[0, 4] += msum((x != xp).astype(jnp.float32))
            for j in range(m):  # m small + static: unrolled
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
                    # damped-update basis column: gp already streams
                    # through VMEM, VPU cost only
                    sp_ref[j, 3] += msum(Sj * gpv)
                    yp_ref[j, 3] += msum(Yj * gpv)

        is_tail = (i + 1) * R > nrows_ref[0]

        @pl.when(~is_tail)
        def _():
            acc_all(jnp.sum)

        @pl.when(is_tail)
        def _():
            grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
            valid = grow < nrows_ref[0]
            acc_all(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))

    def trial_pair_gram_pallas(xp, d, gp, stp, S, Y, end,
                               interpret: bool = False, with_gp: bool = False,
                               off=0, ex=None):
        """One-pass trial + pair + Gram epilogue; see the Rosenbrock
        original for the full output contract (xt, fx, g, dg, gg, xx,
        changed, S_new, Y_new, SP, YP)."""
        n = xp.shape[0]
        m = S.shape[0]
        if not fused.lane_aligned(n):
            raise ValueError(f"n={n} is not lane-aligned")
        rows = n // L
        if S.shape != (m, rows, L):
            raise ValueError(
                f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
        nb, br = fused.epilogue_grid(n)
        as2 = lambda v: v.reshape(rows, L)
        vb = lambda: pl.BlockSpec((br, L), lambda i, e, r: (i, 0))
        hb = lambda: pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0))
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # end, nrows (output index maps)
            grid=(nb,),
            in_specs=[smem(), smem(), vb(), vb(), vb()] + [vb()] * nex
            + [hb(), hb()],
            out_specs=(
                vb(), vb(),
                pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
                pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
                smem(), smem(), smem(), smem(),
            ),
        )
        ncols = 4 if with_gp else 3
        # in-place carry aliasing (inputs counted incl. the 2 prefetch
        # scalars): xp(4)->xt, gp(6)->g, S(7+nex)->S_new, Y(8+nex)->Y_new.
        # Without it XLA stabilizes the while carry with full-vector
        # copies per iteration (trace-measured 2.43 ms/iter at n=1e8).
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
            input_output_aliases={4: 0, 6: 1, 7 + nex: 2, 8 + nex: 3},
            interpret=interpret,
        )(
            jnp.asarray([end], jnp.int32),
            jnp.asarray([rows], jnp.int32),
            jnp.asarray([stp], xp.dtype),
            jnp.stack([jnp.asarray(off, jnp.int32)]),
            as2(xp), as2(d), as2(gp), *_ex_rows(rows, ex), S, Y,
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
        try:
            _check(xp.shape[0])
        except ValueError:
            return False
        return (
            fused.can_pair_gram_pallas(xp, S, *extras)
            and fused._kernel_enabled("trial")
            and _mesh_splits(xp.shape[0])
        )

    def trial_pair_gram(xp, d, gp, stp, S, Y, end, with_gp=False):
        """Dispatch (shard-local + one psum under kernels_on_mesh)."""
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(stp_, end_, xp_, d_, gp_, S_, Y_, *ex_):
                off = jax.lax.axis_index(ax) * xp_.shape[0]
                (xt, fx, g, dg, gg, xx, changed, S_new, Y_new, SP, YP) = (
                    ns.trial_pair_gram_pallas(
                        xp_, d_, gp_, stp_[0], S_, Y_, end_[0],
                        interpret=fused.interpret_mode(), with_gp=with_gp,
                        off=off, ex=ex_,
                    )
                )
                part = jnp.stack([dg, gg, xx, changed.astype(dg.dtype)])
                return (
                    xt, g, S_new, Y_new,
                    jax.lax.psum(fx, ax), jax.lax.psum(part, ax),
                    jax.lax.psum(SP, ax), jax.lax.psum(YP, ax),
                )

            vec, hist, rep = P(ax), P(None, ax, None), P()
            xt, g, S_new, Y_new, fx, part, SP, YP = fused._shard_map(
                local, mesh,
                (rep, rep, vec, vec, vec, hist, hist) + (vec,) * nex,
                (vec, vec, hist, hist, rep, rep, rep, rep),
            )(
                jnp.asarray([stp], xp.dtype), jnp.asarray([end], jnp.int32),
                xp, d, gp, S, Y, *extras,
            )
            return (xt, fx, g, part[0], part[1], part[2], part[3] > 0.0,
                    S_new, Y_new, SP, YP)
        return ns.trial_pair_gram_pallas(
            xp, d, gp, stp, S, Y, end, interpret=fused.interpret_mode(),
            with_gp=with_gp,
        )

    # ---------------- OWL-QN one-kernel epilogue ----------------------

    def _owlqn_tpg_kernel(*refs, with_gp=False):
        # prefetch: end, nrows; then scal [stp, c], meta [off, lo, hi],
        # xp, d, gp, pg, *extras, S, Y;
        # outs x, g, pg_new, s, y, acc, sp, yp
        end_ref, nrows_ref, scal_ref, meta_ref = refs[:4]
        xp_ref, d_ref, gp_ref, pg_ref = refs[4], refs[5], refs[6], refs[7]
        ex_refs = refs[8:8 + nex]
        S_ref, Y_ref = refs[8 + nex], refs[9 + nex]
        (xt_ref, g_ref, pgo_ref, s_ref, y_ref, acc_ref, sp_ref,
         yp_ref) = refs[10 + nex:]
        i = pl.program_id(0)
        m, R, Lc = S_ref.shape
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
        off, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2]
        xp = xp_ref[:]
        dd = d_ref[:]
        gpv = gp_ref[:]
        pgo = pg_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        gidx = off + (i * jnp.int32(R) + rows) * jnp.int32(Lc) + cols
        in_win = (gidx >= lo) & (gidx < hi)

        # orthant from the PREVIOUS point's (x, pg) — identical to the
        # search's choose_orthant (src/core.rs:167-180)
        wp = jnp.where(xp == 0.0, _msign(-pgo), _msign(xp))
        xr = xp + stp * dd
        projected = jnp.where(_msign(xr) != _msign(wp),
                              jnp.zeros_like(xr), xr)
        x = jnp.where(in_win, projected, xr)
        xt_ref[:] = x

        fx_elem, g = block_fn(x, gidx, *(r[:] for r in ex_refs))
        del fx_elem  # the OW epilogue's fx comes from the search's probes
        g_ref[:] = g

        # pseudo-gradient at the NEW point (Andrew & Gao Eq. 4)
        right = g + c_l1
        left = g - c_l1
        at_zero = jnp.where(right < 0.0, right,
                            jnp.where(left > 0.0, left, 0.0))
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
            acc_ref[0, 0] += msum(x * x)                          # xx
            acc_ref[0, 1] += msum(pg * pg)                        # pgpg
            acc_ref[0, 2] += msum((x != xp).astype(jnp.float32))  # changed
            if with_gp:
                # damped reconstruction's extra scalars (gp.gp, gp.pg):
                # under OWL-QN the carried norm is ||pg_prev||^2, not
                # ||gp||^2, so both come from this pass
                acc_ref[0, 3] += msum(gpv * gpv)
                acc_ref[0, 4] += msum(gpv * pg)
            for j in range(m):  # m small + static: unrolled
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
                                     with_gp: bool = False, off=0, ex=None):
        """One-pass OWL-QN epilogue; output contract matches the
        Rosenbrock original (x, g, pg_new, S_new, Y_new, SP, YP, xx,
        pgpg, changed [, gpgp, gppg])."""
        n = xp.shape[0]
        m = S.shape[0]
        if not fused.lane_aligned(n):
            raise ValueError(f"n={n} is not lane-aligned")
        rows = n // L
        if S.shape != (m, rows, L):
            raise ValueError(
                f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
        nb, br = fused.epilogue_grid(n)
        as2 = lambda v: v.reshape(rows, L)
        vb = lambda: pl.BlockSpec((br, L), lambda i, e, r: (i, 0))
        hb = lambda: pl.BlockSpec((m, br, L), lambda i, e, r: (0, i, 0))
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[smem(), smem(), vb(), vb(), vb(), vb()]
            + [vb()] * nex + [hb(), hb()],
            out_specs=(
                vb(), vb(), vb(),
                pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
                pl.BlockSpec((1, br, L), lambda i, e, r: (e[0], i, 0)),
                smem(), smem(), smem(),
            ),
        )
        nacc = 5 if with_gp else 3
        ncols = 4 if with_gp else 3
        # in-place aliases (inputs incl. 2 prefetch scalars): xp(4)->x,
        # gp(6)->g, pg(7)->pg_new, S(8+nex)->S_new, Y(9+nex)->Y_new
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
            input_output_aliases={4: 0, 6: 1, 7: 2, 8 + nex: 3, 9 + nex: 4},
            interpret=interpret,
        )(
            jnp.asarray([end], jnp.int32),
            jnp.asarray([rows], jnp.int32),
            jnp.asarray([stp, c], xp.dtype),
            jnp.stack([jnp.asarray(off, jnp.int32),
                       jnp.asarray(start, jnp.int32),
                       jnp.asarray(end_w, jnp.int32)]),
            as2(xp), as2(d), as2(gp), as2(pg), *_ex_rows(rows, ex), S, Y,
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

    def owlqn_trial_pair_gram_ref(xp, d, gp, pg, stp, c, start, end_w, S, Y,
                                  end, with_gp=False):
        """jnp oracle ([m, n] history inputs): composed from the existing
        reference pieces."""
        from .. import orthantwise as ow_ops
        from ..orthantwise import Orthantwise

        ow = Orthantwise(c=c, start=start, end=end_w)
        wp = ow_ops.choose_orthant(ow, xp, pg)
        x = fused.owlqn_trial_step_ref(xp, d, wp, stp, start, end_w)
        _, g = vag(x)
        pg_new = ow_ops.pseudo_gradient(ow, x, g)
        s, y, SP, YP = fused.pair_gram_xg_ref(x, xp, g, gp, pg_new, S, Y, end)
        S_new, Y_new = S.at[end].set(s), Y.at[end].set(y)
        if with_gp:
            SP = jnp.concatenate(
                [SP, jnp.matmul(S_new, gp[:, None], precision="highest")],
                axis=1,
            )
            YP = jnp.concatenate(
                [YP, jnp.matmul(Y_new, gp[:, None], precision="highest")],
                axis=1,
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
        return trial_pair_gram_ok(xp, S)

    def owlqn_trial_pair_gram(xp, d, gp, pg, stp, c, start, end_w, S, Y, end,
                              with_gp=False):
        """Dispatch (shard-local + one psum under kernels_on_mesh)."""
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(stp_, end_, xp_, d_, gp_, pg_, S_, Y_, *ex_):
                off = jax.lax.axis_index(ax) * xp_.shape[0]
                out = ns.owlqn_trial_pair_gram_pallas(
                    xp_, d_, gp_, pg_, stp_[0], c, start, end_w,
                    S_, Y_, end_[0], interpret=fused.interpret_mode(),
                    with_gp=with_gp, off=off, ex=ex_,
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
                (rep, rep, vec, vec, vec, vec, hist, hist) + (vec,) * nex,
                (vec, vec, vec, hist, hist, rep, rep, rep),
            )(
                jnp.asarray([stp], xp.dtype), jnp.asarray([end], jnp.int32),
                xp, d, gp, pg, S, Y, *extras,
            )
            out = (x, g, pg_new, S_new, Y_new, SP, YP,
                   part[0], part[1], part[2] > 0.0)
            if with_gp:
                out = out + (part[3], part[4])
            return out
        return ns.owlqn_trial_pair_gram_pallas(
            xp, d, gp, pg, stp, c, start, end_w, S, Y, end,
            interpret=fused.interpret_mode(), with_gp=with_gp,
        )

    ns.trial_pair_gram_pallas = trial_pair_gram_pallas
    ns.trial_pair_gram_ok = trial_pair_gram_ok
    ns.trial_pair_gram = trial_pair_gram
    ns.owlqn_trial_pair_gram_pallas = owlqn_trial_pair_gram_pallas
    ns.owlqn_trial_pair_gram_ref = owlqn_trial_pair_gram_ref
    ns.owlqn_trial_pair_gram_ok = owlqn_trial_pair_gram_ok
    ns.owlqn_trial_pair_gram = owlqn_trial_pair_gram


# ---------------------------------------------------------------------------
# Combine + speculative-first-probe fusions (plain and OWL-QN)
# ---------------------------------------------------------------------------


def _attach_combines(ns, block_fn, vag, extras, nex, _check, _mesh_splits,
                     _ex_rows):
    """Generate the combine+probe protocols onto ``ns``.

    Skeleton parity: models/rosenbrock ``_combine_probe_kernel`` /
    ``_combine_ow_probe_kernel`` (round 3)."""
    L = fused.LANES

    def _combine_probe_kernel(*refs):
        gamma_ref, nrows_ref, meta_ref, cs_ref, cy_ref = refs[:5]
        g_ref, x_ref = refs[5], refs[6]
        ex_refs = refs[7:7 + nex]
        S_ref, Y_ref = refs[7 + nex], refs[8 + nex]
        r_ref, acc_ref, fxp_ref = refs[9 + nex:]
        i = pl.program_id(0)
        m, R, Lc = S_ref.shape

        @pl.when(i == 0)
        def _():
            for c in range(4):
                acc_ref[0, c] = jnp.float32(0.0)

        gv = g_ref[:]
        # four interleaved accumulation chains, like fused._combine_kernel
        acc = fused._chained_combination(gv.dtype, m, cs_ref, cy_ref,
                                         S_ref, Y_ref)
        acc = gamma_ref[0] * gv + acc
        r_ref[:] = acc

        # speculative first trial of the NEXT search at the PREDICTED
        # entry step (gamma_ref[1]: 1.0 under the literal policy — the
        # multiply is then exact and the round-4 semantics are bitwise
        # unchanged — or growth*step_ls under adaptive_entry_step)
        xt = x_ref[:] + gamma_ref[1] * acc
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        gidx = meta_ref[0] + (i * jnp.int32(R) + rows) * jnp.int32(Lc) + cols
        ft_elem, gt = block_fn(xt, gidx, *(r[:] for r in ex_refs))

        is_tail = (i + 1) * R > nrows_ref[0]

        def accumulate(msum):
            acc_ref[0, 0] += msum(acc * acc)   # ||r||^2
            acc_ref[0, 1] += msum(acc * gv)    # r . g (dginit; sign in gamma)
            bft = msum(ft_elem)
            acc_ref[0, 2] += bft               # f(x + d)
            fxp_ref[i, 0] = bft                # block partial (wide-fx)
            acc_ref[0, 3] += msum(gt * acc)    # g(x + d) . d

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
            valid = grow < nrows_ref[0]
            accumulate(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))

    def combine_probe_pallas(g, x, S, Y, gamma, coef_s, coef_y, stp1=1.0,
                             interpret=False, off=0, ex=None):
        """Direction combine + speculative probe at step ``stp1`` in one
        pass: (r, ||r||^2, r.g, f(x+stp1*r), g(x+stp1*r).r); sign folded
        into gamma."""
        n = g.shape[0]
        m = S.shape[0]
        if not fused.lane_aligned(n):
            raise ValueError(f"n={n} is not lane-aligned")
        rows = n // L
        if S.shape != (m, rows, L):
            raise ValueError(
                f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
        nb, br = fused.epilogue_grid(n)
        vblk = lambda: pl.BlockSpec((br, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        hblk = lambda: pl.BlockSpec((m, br, L), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        r, acc, fxp = fused.pallas_call32(
            _combine_probe_kernel,
            grid=(nb,),
            in_specs=[smem()] * 5 + [vblk(), vblk()] + [vblk()] * nex
            + [hblk(), hblk()],
            out_specs=(vblk(), smem(), smem()),
            out_shape=(
                jax.ShapeDtypeStruct((rows, L), g.dtype),
                jax.ShapeDtypeStruct((1, 4), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ),
            interpret=interpret,
        )(
            jnp.stack([jnp.asarray(gamma, g.dtype),
                       jnp.asarray(stp1, g.dtype)]),
            jnp.asarray([rows], jnp.int32),
            jnp.stack([jnp.asarray(off, jnp.int32)]),
            jnp.asarray(coef_s, g.dtype),
            jnp.asarray(coef_y, g.dtype),
            g.reshape(rows, L), x.reshape(rows, L), *_ex_rows(rows, ex), S, Y,
        )
        a = lambda c: acc[0, c].astype(g.dtype)
        ft = (fused.obj_reduce(fxp[:, 0], g.dtype)
              if fused.wide_fx_active() else a(2))
        return r.reshape(-1), a(0), a(1), ft, a(3)

    def combine_probe_ref(g, x, S, Y, gamma, coef_s, coef_y, stp1=1.0):
        """jnp oracle ([m, n] history inputs)."""
        r = fused.combine_ref(g, S, Y, gamma, coef_s, coef_y)
        xt = x + stp1 * r
        ft, gt = vag(xt)
        return r, jnp.dot(r, r), jnp.dot(r, g), ft, jnp.dot(gt, r)

    def combine_probe(g, x, S, Y, gamma, coef_s, coef_y, stp1=1.0):
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(gamma_, cs_, cy_, g_, x_, S_, Y_, *ex_):
                off = jax.lax.axis_index(ax) * g_.shape[0]
                r, rr, rd, ft, dgt = ns.combine_probe_pallas(
                    g_, x_, S_, Y_, gamma_[0], cs_, cy_, stp1=gamma_[1],
                    interpret=fused.interpret_mode(), off=off, ex=ex_,
                )
                part = jax.lax.psum(jnp.stack([rr, rd, dgt]), ax)
                return r, jax.lax.psum(ft, ax), part

            vec, hist, rep = P(ax), P(None, ax, None), P()
            r, ft, part = fused._shard_map(
                local, mesh,
                (rep, rep, rep, vec, vec, hist, hist) + (vec,) * nex,
                (vec, rep, rep)
            )(
                jnp.stack([jnp.asarray(gamma, g.dtype),
                           jnp.asarray(stp1, g.dtype)]),
                jnp.asarray(coef_s, g.dtype),
                jnp.asarray(coef_y, g.dtype),
                g, x, S, Y, *extras,
            )
            return r, part[0], part[1], ft, part[2]
        return ns.combine_probe_pallas(
            g, x, S, Y, gamma, coef_s, coef_y, stp1=stp1,
            interpret=fused.interpret_mode()
        )

    def combine_probe_ok(x, S) -> bool:
        try:
            _check(x.shape[0])
        except ValueError:
            return False
        return (
            fused.can_combine_pallas(x, S, *extras)
            and fused._kernel_enabled("combine_probe")
            and _mesh_splits(x.shape[0])
        )

    # ---------------- OWL-QN combine + constraint + probe -------------

    def _combine_ow_probe_kernel(*refs):
        gamma_ref, nrows_ref, meta_ref, cs_ref, cy_ref = refs[:5]
        pg_ref, x_ref = refs[5], refs[6]
        ex_refs = refs[7:7 + nex]
        S_ref, Y_ref = refs[7 + nex], refs[8 + nex]
        r_ref, acc_ref, fxp_ref = refs[9 + nex:]
        i = pl.program_id(0)
        m, R, Lc = S_ref.shape

        @pl.when(i == 0)
        def _():
            for c in range(6):
                acc_ref[0, c] = jnp.float32(0.0)

        pg = pg_ref[:]
        xv = x_ref[:]
        acc = fused._chained_combination(pg.dtype, m, cs_ref, cy_ref,
                                         S_ref, Y_ref)
        acc = gamma_ref[0] * pg + acc

        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 1)
        gidx = meta_ref[0] + (i * jnp.int32(R) + rows) * jnp.int32(Lc) + cols
        in_win = (gidx >= meta_ref[1]) & (gidx < meta_ref[2])
        # direction constraint vs -pg (src/orthantwise.rs:140-161)
        kill = in_win & (_msign(acc) != _msign(-pg))
        rc = jnp.where(kill, jnp.zeros_like(acc), acc)
        r_ref[:] = rc

        # speculative OW trial at the predicted entry step gamma_ref[1]
        # (1.0 literal — exact multiply — or the adaptive prediction):
        # orthant from (x, pg), project
        wp = jnp.where(xv == 0.0, _msign(-pg), _msign(xv))
        xr = xv + gamma_ref[1] * rc
        projected = jnp.where(_msign(xr) != _msign(wp),
                              jnp.zeros_like(xr), xr)
        xt = jnp.where(in_win, projected, xr)
        ft_elem, gt = block_fn(xt, gidx, *(r[:] for r in ex_refs))

        is_tail = (i + 1) * R > nrows_ref[0]

        def accumulate(msum):
            acc_ref[0, 0] += msum(acc * acc)   # ||r||^2 pre-constrain
            acc_ref[0, 1] += msum(rc * rc)     # ||rc||^2
            acc_ref[0, 2] += msum(rc * pg)     # rc . pg (next dginit)
            bft = msum(ft_elem)
            bl1 = msum(jnp.where(in_win, jnp.abs(xt), 0.0))
            acc_ref[0, 3] += bft               # f(xt)
            acc_ref[0, 4] += bl1               # L1
            fxp_ref[i, 0] = bft                # block partials (wide-fx)
            fxp_ref[i, 1] = bl1
            acc_ref[0, 5] += msum(gt * rc)     # g(xt) . rc

        @pl.when(~is_tail)
        def _():
            accumulate(jnp.sum)

        @pl.when(is_tail)
        def _():
            grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, Lc), 0)
            valid = grow < nrows_ref[0]
            accumulate(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))

    def combine_ow_probe_pallas(pg, x, S, Y, gamma, coef_s, coef_y, c,
                                start, end, stp1=1.0,
                                interpret: bool = False, off=0, ex=None):
        """Returns (rc, rr_pre, rc2, rcd, ft_incl_L1, dgt)."""
        n = pg.shape[0]
        m = S.shape[0]
        if not fused.lane_aligned(n):
            raise ValueError(f"n={n} is not lane-aligned")
        rows = n // L
        if S.shape != (m, rows, L):
            raise ValueError(
                f"history must be ring-major [m, {rows}, {L}], got {S.shape}")
        nb, br = fused.epilogue_grid(n)
        vblk = lambda: pl.BlockSpec((br, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        hblk = lambda: pl.BlockSpec((m, br, L), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        r, acc, fxp = fused.pallas_call32(
            _combine_ow_probe_kernel,
            grid=(nb,),
            in_specs=[smem()] * 5 + [vblk(), vblk()] + [vblk()] * nex
            + [hblk(), hblk()],
            out_specs=(vblk(), smem(), smem()),
            out_shape=(
                jax.ShapeDtypeStruct((rows, L), pg.dtype),
                jax.ShapeDtypeStruct((1, 6), jnp.float32),
                jax.ShapeDtypeStruct((nb, 2), jnp.float32),
            ),
            interpret=interpret,
        )(
            jnp.stack([jnp.asarray(gamma, pg.dtype),
                       jnp.asarray(stp1, pg.dtype)]),
            jnp.asarray([rows], jnp.int32),
            jnp.stack([jnp.asarray(off, jnp.int32),
                       jnp.asarray(start, jnp.int32),
                       jnp.asarray(end, jnp.int32)]),
            jnp.asarray(coef_s, pg.dtype),
            jnp.asarray(coef_y, pg.dtype),
            pg.reshape(rows, L), x.reshape(rows, L), *_ex_rows(rows, ex), S, Y,
        )
        a = lambda j: acc[0, j].astype(pg.dtype)
        if fused.wide_fx_active():
            ft = fused.obj_axpy(c, fused.obj_reduce(fxp[:, 1], pg.dtype),
                                fused.obj_reduce(fxp[:, 0], pg.dtype))
        else:
            ft = a(3) + jnp.asarray(c, pg.dtype) * a(4)
        return r.reshape(-1), a(0), a(1), a(2), ft, a(5)

    def combine_ow_probe_ref(pg, x, S, Y, gamma, coef_s, coef_y, c,
                             start, end, stp1=1.0):
        """jnp oracle ([m, n] history inputs)."""
        rc, rr, rc2, rcd = fused.combine_ow_ref(
            pg, S, Y, gamma, coef_s, coef_y, start, end
        )
        wp = jnp.where(x == 0.0, _msign(-pg), _msign(x))
        xt, ft, gt, dgt, _, _ = ns.owlqn_trial_ref(x, rc, wp, stp1, c,
                                                   start, end)
        return rc, rr, rc2, rcd, ft, dgt

    def combine_ow_probe(pg, x, S, Y, gamma, coef_s, coef_y, c, start, end,
                         stp1=1.0):
        ma = fused.active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            from jax.sharding import PartitionSpec as P

            mesh, ax = ma

            def local(gamma_, cs_, cy_, pg_, x_, S_, Y_, *ex_):
                off = jax.lax.axis_index(ax) * pg_.shape[0]
                rc, rr, rc2, rcd, ft, dgt = ns.combine_ow_probe_pallas(
                    pg_, x_, S_, Y_, gamma_[0], cs_, cy_, c, start, end,
                    stp1=gamma_[1],
                    interpret=fused.interpret_mode(), off=off, ex=ex_,
                )
                part = jax.lax.psum(jnp.stack([rr, rc2, rcd, dgt]), ax)
                return rc, jax.lax.psum(ft, ax), part

            vec, hist, rep = P(ax), P(None, ax, None), P()
            rc, ft, part = fused._shard_map(
                local, mesh,
                (rep, rep, rep, vec, vec, hist, hist) + (vec,) * nex,
                (vec, rep, rep)
            )(
                jnp.stack([jnp.asarray(gamma, pg.dtype),
                           jnp.asarray(stp1, pg.dtype)]),
                jnp.asarray(coef_s, pg.dtype),
                jnp.asarray(coef_y, pg.dtype),
                pg, x, S, Y, *extras,
            )
            return rc, part[0], part[1], part[2], ft, part[3]
        return ns.combine_ow_probe_pallas(
            pg, x, S, Y, gamma, coef_s, coef_y, c, start, end, stp1=stp1,
            interpret=fused.interpret_mode(),
        )

    def combine_ow_probe_ok(x, S) -> bool:
        return combine_probe_ok(x, S)

    ns.combine_probe_pallas = combine_probe_pallas
    ns.combine_probe_ref = combine_probe_ref
    ns.combine_probe = combine_probe
    ns.combine_probe_ok = combine_probe_ok
    ns.combine_ow_probe_pallas = combine_ow_probe_pallas
    ns.combine_ow_probe_ref = combine_ow_probe_ref
    ns.combine_ow_probe = combine_ow_probe
    ns.combine_ow_probe_ok = combine_ow_probe_ok
