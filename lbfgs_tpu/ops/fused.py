"""Pallas TPU kernels for the solver's fused elementwise hot paths.

The reference's scalar loops (``src/orthantwise.rs:82-171``,
``src/core.rs:155-164``) become one-pass VMEM kernels here:

  * ``owlqn_trial_step`` — x = project(xp + stp*d, wp): the OWL-QN
    line-search trial point, 3 reads + 1 write in a single pass (the
    dominant elementwise op of the OWL-QN inner loop; one launch replaces
    the add/select chain).
  * ``owlqn_pseudo_gradient`` — Andrew & Gao Eq. 4 with the window mask
    computed in-kernel from program position (no [n] mask array in HBM).
  * ``axpy_dot`` — z = y + c*x together with z . w in one pass.  Not on
    the default solver path (the compact two-loop batches its reductions
    into matvecs instead); provided for scan-mode composition and as a
    reference pattern for reduction-carrying kernels.

Each kernel has a jnp reference implementation (`*_ref`) used (a) on
non-TPU backends / f64 inputs, where XLA fusion already serves, and
(b) as the golden oracle in tests (interpret mode on CPU).  Dispatch is
automatic via ``maybe_*`` wrappers.

Kernels pad the vector to the f32 lane layout (8x128) and grid over
row-blocks; padding lanes are masked where semantics require it.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import Array

try:  # pallas import is safe on CPU (used with interpret=True in tests)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANES = 128
SUBLANES = 8


def _block_rows_env() -> int:
    """LBFGS_TPU_BLOCK_ROWS, validated: Mosaic requires sublane-aligned
    (rows, 128) blocks, so a non-multiple-of-8 value would fail at kernel
    compile time with an opaque error — round it up here instead."""
    raw = int(os.environ.get("LBFGS_TPU_BLOCK_ROWS", "1024"))
    if raw <= 0:
        raise ValueError(
            f"LBFGS_TPU_BLOCK_ROWS must be positive, got {raw}"
        )
    return -(-raw // SUBLANES) * SUBLANES


# rows of 128 lanes per grid step for the vector-only kernels (trial/
# probe) -> 128K elems/block at the default; env-tunable for measurement
# (PERF.md lesson 8: size blocks to the scoped-VMEM budget).  Round-5
# sweep: the 2-4-operand kernels keep gaining from larger blocks well
# past the old 512-row default (2^24: 360.7 -> 368.5 iters/s at 1024;
# 1e8: 69.5 -> 72.4 at 2048, plateau at 3072) — fewer grid steps to
# orchestrate per pass, and these kernels are nowhere near the 16 MB
# scoped-VMEM budget that pins the 17-operand epilogues at 768 rows.
BLOCK_ROWS = _block_rows_env()
_BLOCK_ROWS_EXPLICIT = "LBFGS_TPU_BLOCK_ROWS" in os.environ

#: large-n bump for the same kernels: at n >= 2^25 the default target
#: grows to 2048 rows (measured optimum at n = 1e8); an explicit
#: LBFGS_TPU_BLOCK_ROWS always wins
BLOCK_ROWS_BIG = 2048
BIG_N_ROWS = (1 << 25) // LANES


def _pad_to_block(v: Array) -> tuple[Array, int]:
    n = v.shape[0]
    per_block = BLOCK_ROWS * LANES
    nb = -(-n // per_block)
    padded = nb * per_block
    if padded != n:
        v = jnp.pad(v, (0, padded - n))
    return v.reshape(nb * BLOCK_ROWS, LANES), nb


def lane_aligned(n: int) -> bool:
    return n % LANES == 0


def kernel_grid(n: int, target: int | None = None,
                nblk: int = 4) -> tuple[int, int]:
    """(nb, br) covering a lane-aligned [n] vector (viewed [rows, 128])
    with sublane-aligned (br, 128) blocks and a cdiv grid.  The tail block
    may run past the array: Mosaic masks out-of-bounds writes and the
    reduction kernels mask their accumulations by global index, so NO
    padding copy is ever made (padding an operand costs a whole extra
    HBM pass — at n ~ 1e8 that doubles a kernel's traffic).

    ``target=None`` uses the vector-kernel default (BLOCK_ROWS, bumped
    to BLOCK_ROWS_BIG at n >= 2^25 unless the env var pinned a size).
    ``nblk`` is the kernel's VECTOR-BLOCK count (ins + outs): the bump
    applies only to kernels of <= 4 blocks — measured on v5e, a
    5-block kernel at 2048 rows allocates 20.65M of scoped VMEM against
    Mosaic's 16M limit, while 4-block kernels fit."""
    rows = n // LANES
    if target is None:
        target = BLOCK_ROWS
        if not _BLOCK_ROWS_EXPLICIT and rows >= BIG_N_ROWS and nblk <= 4:
            target = max(target, BLOCK_ROWS_BIG)
    br = min(target, -(-rows // SUBLANES) * SUBLANES)
    nb = -(-rows // br)
    return nb, br


#: row-block size for the history kernels (pair_gram / combine).  They move
#: ~17 double-buffered operands per grid step; 768 rows measured best
#: (2048-row tiles with a raised CompilerParams vmem_limit were ~7%
#: SLOWER — too few grid steps to overlap DMA with compute — so the
#: kernels stay inside Mosaic's default 16 MB scoped budget).
#: Env-tunable like BLOCK_ROWS for block-size sweeps (bench_kernels.py).
HIST_BLOCK_ROWS = -(-int(os.environ.get("LBFGS_TPU_HIST_BLOCK_ROWS", "768"))
                    // SUBLANES) * SUBLANES


#: kernels on by default.  pair_gram / combine require the ring-major
#: [m, n/128, 128] history storage (core.History): against a [m, n] stack
#: the view they need is not a bitcast (T(8,128) tiling puts m in
#: sublanes) and XLA copies the whole history per call — measured
#: 73.8 -> 57.2 iters/s at n=2^24 before the storage change.
DEFAULT_KERNELS = {"trial", "pair_gram", "combine"}


def _kernel_enabled(name: str) -> bool:
    """Per-kernel dispatch switch: LBFGS_TPU_KERNELS is a comma list of
    {trial, pair_gram, combine}, or "all"; unset uses DEFAULT_KERNELS."""
    sel = os.environ.get("LBFGS_TPU_KERNELS")
    if sel is None:
        return name in DEFAULT_KERNELS
    return sel == "all" or name in sel.split(",")


def _to_blocks(v: Array, nblk: int = 4) -> tuple[Array, int, int]:
    """Reshape ``v`` to [rows, LANES] row blocks (copy-free when
    lane-aligned, tail-masked cdiv grid), else zero-padded to BLOCK_ROWS
    blocks.  Returns (reshaped, nb, br).  ``nblk``: the calling kernel's
    vector-block count (see kernel_grid)."""
    n = v.shape[0]
    if lane_aligned(n):
        nb, br = kernel_grid(n, nblk=nblk)
        return v.reshape(n // LANES, LANES), nb, br
    v2, nb = _pad_to_block(v)
    return v2, nb, BLOCK_ROWS


#: below this length the kernels don't pay for themselves (and the vmapped
#: scenario-batch regime, which uses tiny n, must keep the jnp path so the
#: whole batch vectorizes)
MIN_FUSED_N = 1 << 14


def epilogue_grid(n: int) -> tuple[int, int]:
    """(nb, br) for the many-operand epilogue kernels (trial_pair_gram /
    owlqn_tpg).  At SHORT grids Mosaic's pipelining for these 17-operand
    kernels allocates past the 16 MB scoped-VMEM default (measured: the
    n=2^20 entry config rejects at br=768/nb=11 with 16.68 MB, while
    n=2^24 at nb=171 fits) — and raising the limit instead costs ~20% on
    the kernel at scale (PERF lesson 8: the 16 MB budget is the tuned
    operating point).  Shrink the block until the grid is long enough."""
    target = HIST_BLOCK_ROWS
    nb, br = kernel_grid(n, target)
    # Single-block grids are safe (one block set of VMEM) and must stay
    # untouched — the observed over-allocation is Mosaic buffering SHORT
    # MULTI-block grids in full (11 blocks x ~1.5 MB = the rejected
    # 16.68 MB at n=2^20), so only the 1 < nb < 24 zone shrinks.
    while 1 < nb < 24 and target > SUBLANES:
        # halve, keeping the target sublane-aligned (a non-multiple-of-8
        # block is a Mosaic compile error on real hardware; the
        # interpreter would silently accept it)
        target = max(SUBLANES, (target // 2 // SUBLANES) * SUBLANES)
        nb, br = kernel_grid(n, target)
    return nb, br


def interpret_mode() -> bool:
    """LBFGS_TPU_KERNELS_INTERPRET=1 forces every kernel through the Pallas
    interpreter on the current backend — the CI hook that trajectory-pins
    the kernel math on CPU (tests/test_native_parity.py)."""
    return bool(os.environ.get("LBFGS_TPU_KERNELS_INTERPRET"))


# ---------------------------------------------------------------------------
# Wide (f64) objective-scalar mode
# ---------------------------------------------------------------------------
#
# The reference is f64 throughout (src/math.rs:4-82, src/orthantwise.rs:70-79);
# the TPU build streams f32 vectors for bandwidth, which caps the OBJECTIVE
# SCALAR's resolution at ~7 digits — at the n = 1e8 OWL-QN scale the L1 term
# pins fx at ~4e7 where f32 cannot represent the per-step Armijo
# sufficient-decrease differences, and the search stalls (PERF.md).  The
# TPU-native fix (``params.fx_wide``): every vector stream stays f32, but
# the objective-bearing kernels emit PER-BLOCK f32 partial sums (each over
# <= ~10^5 elements, so each partial is full f32 precision at its own
# scale) and the cross-block reduction runs in f64 OUTSIDE the kernel —
# O(grid) scalar work, negligible next to the streaming.  fx and the
# line-search bookkeeping scalars (finit/ft/fy) then carry as f64; TPU
# scalar-f64 emulation is O(1) ops/iteration.
#
# The mode is trace-time static: the solver enters ``wide_fx(params.fx_wide)``
# around its traced bodies, and kernel wrappers read ``wide_fx_active()``
# to pick the reduction dtype.  The default path reads the kernels' SMEM
# accumulators exactly as before (bitwise-unchanged numerics).

_WIDE_FX: list = []


class wide_fx:
    """Context manager: objective scalars reduce/carry in f64 inside."""

    def __init__(self, enabled: bool = True):
        self._enabled = bool(enabled)

    def __enter__(self):
        _WIDE_FX.append(self._enabled)
        return self

    def __exit__(self, *exc):
        _WIDE_FX.pop()
        return False


def wide_fx_active() -> bool:
    if os.environ.get("LBFGS_TPU_WIDE_FX"):
        return True
    return bool(_WIDE_FX and _WIDE_FX[-1])


def trace32():
    """Context for tracing Pallas kernel bodies in 32-bit mode.

    Under ``jax_enable_x64`` (the wide-fx configuration) python-int
    literals inside kernel bodies promote index math to i64, which
    Mosaic cannot lower (`_convert_helper` recurses on the i64 convert;
    reproduced on the v5e).  The kernels are pure f32/i32 by design, so
    every ``pl.pallas_call`` invocation wraps in this context — operand
    avals are fixed before entry and the f64 cross-block reductions
    happen on the OUTSIDE."""
    return jax.enable_x64(False)


def pallas_call32(*args, **kw):
    """``pl.pallas_call`` with the kernel body traced under ``trace32``.

    Drop-in replacement used at every kernel call site: construction is
    unchanged; the returned callable enters the 32-bit context around
    the invocation (which is when Pallas traces the kernel body)."""
    inner = pl.pallas_call(*args, **kw)

    def invoke(*operands):
        with trace32():
            return inner(*operands)

    return invoke


def wide_mode() -> str:
    """How the wide objective scalar is represented: ``'off'`` (vector
    dtype), ``'f64'`` (real f64 scalars — requires ``jax_enable_x64``),
    or ``'df32'`` (double-float two-f32 carry, ``ops/df.py`` — no global
    flag needed; ~48-bit resolution).  The representation is chosen
    automatically from the x64 config so ``params.fx_wide`` works in any
    process (VERDICT round-4 missing #2: the f64 path's x64 requirement
    changed dtype semantics for ALL user code)."""
    if not wide_fx_active():
        return "off"
    import jax as _jax

    return "f64" if _jax.config.jax_enable_x64 else "df32"


def obj_dtype(vdtype):
    """The dtype objective scalars carry in: f64 under wide_fx/x64, else
    the vector dtype (df32 values are (2,) f32 leaves, see wide_mode)."""
    return jnp.float64 if wide_mode() == "f64" else jnp.dtype(vdtype)


def obj_reduce(parts: Array, vdtype) -> Array:
    """Cross-block reduction of per-block objective partials in the
    objective representation."""
    mode = wide_mode()
    if mode == "df32":
        from . import df

        return df.sum_f32(parts)
    if mode == "f64":
        return jnp.sum(parts.astype(jnp.float64))
    return jnp.sum(parts.astype(jnp.dtype(vdtype)))


def obj_sum(v: Array) -> Array:
    """Full-vector objective reduction for the jnp (non-kernel) paths:
    same two-stage structure as the kernels under wide_fx — f32 block
    partials, wide cross-block total — so the generic evaluate boundary
    (``core.evaluate``, reference ``src/core.rs:119-132``) gets the same
    resolution as the fused trials.  Plain single-stage sum otherwise."""
    if not wide_fx_active():
        return jnp.sum(v)
    B = 2048
    n = v.shape[0]
    pad = (-n) % B
    if pad:
        v = jnp.pad(v, (0, pad))
    parts = v.reshape(-1, B).sum(axis=1)
    return obj_reduce(parts, v.dtype)


# -- representation-generic scalar algebra on objective values -------------
# Every objective-scalar expression outside the kernels goes through these
# (plain arithmetic would broadcast ELEMENTWISE over a df's (hi, lo) pair,
# silently discarding the error term); under 'off'/'f64' they reduce to
# the ordinary expressions.


def _is_df_val(v) -> bool:
    from . import df

    return df.is_df(v)


def obj_lift(fx):
    """Lift a plain objective scalar into the active representation
    (identity when it already is one, e.g. out of ``obj_sum``)."""
    mode = wide_mode()
    if mode == "f64":
        return jnp.asarray(fx, jnp.float64)
    if mode == "df32":
        from . import df

        return fx if _is_df_val(fx) else df.from_f(fx)
    return fx


def obj_add(a, b):
    """a + b on objective values."""
    if _is_df_val(a) or _is_df_val(b):
        from . import df

        if not _is_df_val(a):
            return df.add_f(b, a)
        if not _is_df_val(b):
            return df.add_f(a, b)
        return df.add(a, b)
    return a + b


def obj_scale(a, c):
    """c * a on an objective value (c: plain scalar)."""
    if _is_df_val(a):
        from . import df

        return df.scale(a, c)
    return c * a


def obj_axpy(c, a, b):
    """b + c * a on objective values (the fx + c*L1 composition)."""
    if _is_df_val(a) or _is_df_val(b):
        return obj_add(b, obj_scale(a, c))
    if jnp.result_type(b) == jnp.float64:
        return b + jnp.float64(c) * a
    return b + jnp.asarray(c, jnp.result_type(b)) * a


def obj_float(fx):
    """Collapse an objective value to a plain scalar (pf ring, host
    reports); f64 passes through, df collapses to its nearest f32."""
    if _is_df_val(fx):
        from . import df

        return df.value(fx)
    return fx


# ---------------------------------------------------------------------------
# Multi-device dispatch: kernels under shard_map
# ---------------------------------------------------------------------------
#
# A bare pallas_call inside a GSPMD-partitioned program would see the FULL
# array (forcing a gather); under ``kernels_on_mesh`` the dispatchers
# instead wrap each kernel in ``jax.shard_map`` over the vector axis: every
# device runs the kernel on its local rows and the SMEM scalar accumulators
# become shard-partials combined by ONE psum — the same collective round
# the jnp path's reductions pay, with the kernel's fusion wins kept.

_ACTIVE_MESH: list = []  # stack of (Mesh, axis_name)


class kernels_on_mesh:
    """Context manager enabling the Pallas kernels on a multi-device mesh.

    ::

        with parallel.kernels_on_mesh(mesh):
            st = minimize_jit(params, x_sharded, objective)

    Inside the context every fused kernel runs shard-local via
    ``jax.shard_map`` (vectors split on the n axis, history on its row
    axis) with one psum per kernel for the scalar accumulators.  The
    sharded trajectory is tolerance-equivalent to the unsharded one (the
    partial-sum split reassociates the f32 reductions — same contract as
    GSPMD's own reduction partitioning; tests/test_sharding.py pins it).
    """

    def __init__(self, mesh, axis_name: str | None = None):
        if axis_name is None:
            axis_name = mesh.axis_names[0]
        self._entry = (mesh, axis_name)

    def __enter__(self):
        _ACTIVE_MESH.append(self._entry)
        return self._entry[0]

    def __exit__(self, *exc):
        _ACTIVE_MESH.pop()
        return False


def active_mesh():
    """(Mesh, axis_name) the kernels should shard_map over, or None."""
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: the bodies mix pallas_call (opaque to the varying
    # -axes checker) with psum
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def _use_pallas(*arrays: Array) -> bool:
    if not HAVE_PALLAS:
        return False
    if os.environ.get("LBFGS_TPU_NO_PALLAS"):
        return False
    if interpret_mode():
        # interpreter runs anywhere, incl. under shard_map on the
        # 8-virtual-device CPU test mesh
        return all(a.dtype == jnp.float32 for a in arrays)
    if jax.default_backend() != "tpu":
        return False
    # On a multi-device runtime the kernels need the shard_map wrapping,
    # which requires the caller to name the mesh (kernels_on_mesh); with
    # no active mesh the jnp path partitions under GSPMD instead.
    if jax.device_count() > 1 and active_mesh() is None:
        return False
    return all(a.dtype == jnp.float32 for a in arrays)


# ---------------------------------------------------------------------------
# signum helper shared by kernels (math convention: 0 at 0/NaN)
# ---------------------------------------------------------------------------


def _msign(v):
    return jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))


# ---------------------------------------------------------------------------
# OWL-QN trial step: x = project(xp + stp * d, wp) inside [start, end)
# ---------------------------------------------------------------------------


def owlqn_trial_step_ref(xp, d, wp, stp, start, end):
    x = xp + stp * d
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    mask = (idx >= start) & (idx < end)
    projected = jnp.where(_msign(x) != _msign(wp), jnp.zeros_like(x), x)
    return jnp.where(mask, projected, x)


def _trial_step_kernel(stp_ref, lo_ref, hi_ref, xp_ref, d_ref, wp_ref, o_ref):
    stp = stp_ref[0]
    lo = lo_ref[0]
    hi = hi_ref[0]
    i = pl.program_id(0)
    base = i * BLOCK_ROWS * LANES
    x = xp_ref[:] + stp * d_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    gidx = base + rows * LANES + cols
    in_window = (gidx >= lo) & (gidx < hi)
    wp = wp_ref[:]
    projected = jnp.where(_msign(x) != _msign(wp), jnp.zeros_like(x), x)
    o_ref[:] = jnp.where(in_window, projected, x)


def owlqn_trial_step_pallas(xp, d, wp, stp, start, end, interpret=False):
    n = xp.shape[0]
    xp2, nb = _pad_to_block(xp)
    d2, _ = _pad_to_block(d)
    wp2, _ = _pad_to_block(wp)
    stp_a = jnp.asarray([stp], xp.dtype)
    lo = jnp.asarray([start], jnp.int32)
    hi = jnp.asarray([end], jnp.int32)

    out = pallas_call32(
        _trial_step_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xp2.shape, xp.dtype),
        interpret=interpret,
    )(stp_a, lo, hi, xp2, d2, wp2)
    return out.reshape(-1)[:n]


def owlqn_trial_step(xp, d, wp, stp, start, end):
    if xp.shape[0] >= MIN_FUSED_N and _use_pallas(xp, d, wp):
        ma = active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            mesh, ax = ma
            if xp.shape[0] % (ma[0].devices.size * LANES) == 0:
                from jax.sharding import PartitionSpec as P

                def local(stp_, xp_, d_, wp_):
                    # the [start, end) window is GLOBAL: shift it into
                    # this shard's local index space
                    off = jax.lax.axis_index(ax) * xp_.shape[0]
                    return owlqn_trial_step_pallas(
                        xp_, d_, wp_, stp_[0], start - off, end - off,
                        interpret=interpret_mode(),
                    )

                return _shard_map(
                    local, mesh, (P(), P(ax), P(ax), P(ax)), P(ax)
                )(jnp.asarray([stp], xp.dtype), xp, d, wp)
        else:
            return owlqn_trial_step_pallas(xp, d, wp, stp, start, end,
                                           interpret=interpret_mode())
    return owlqn_trial_step_ref(xp, d, wp, stp, start, end)


# ---------------------------------------------------------------------------
# OWL-QN pseudo-gradient (Eq. 4)
# ---------------------------------------------------------------------------


def owlqn_pseudo_gradient_ref(x, g, c, start, end):
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    mask = (idx >= start) & (idx < end)
    right = g + c
    left = g - c
    at_zero = jnp.where(right < 0.0, right, jnp.where(left > 0.0, left, 0.0))
    inside = jnp.where(x != 0.0, g + jnp.sign(x) * c, at_zero)
    return jnp.where(mask, inside, g)


def _pseudo_grad_kernel(c_ref, lo_ref, hi_ref, x_ref, g_ref, o_ref):
    c = c_ref[0]
    lo = lo_ref[0]
    hi = hi_ref[0]
    i = pl.program_id(0)
    base = i * BLOCK_ROWS * LANES
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    gidx = base + rows * LANES + cols
    in_window = (gidx >= lo) & (gidx < hi)
    x = x_ref[:]
    g = g_ref[:]
    right = g + c
    left = g - c
    at_zero = jnp.where(right < 0.0, right, jnp.where(left > 0.0, left, 0.0))
    inside = jnp.where(x != 0.0, g + jnp.sign(x) * c, at_zero)
    o_ref[:] = jnp.where(in_window, inside, g)


def owlqn_pseudo_gradient_pallas(x, g, c, start, end, interpret=False):
    n = x.shape[0]
    x2, nb = _pad_to_block(x)
    g2, _ = _pad_to_block(g)
    c_a = jnp.asarray([c], x.dtype)
    lo = jnp.asarray([start], jnp.int32)
    hi = jnp.asarray([end], jnp.int32)
    out = pallas_call32(
        _pseudo_grad_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(c_a, lo, hi, x2, g2)
    return out.reshape(-1)[:n]


def owlqn_pseudo_gradient_norm_ref(x, g, c, start, end):
    pg = owlqn_pseudo_gradient_ref(x, g, c, start, end)
    from . import vecmath as vm

    return pg, vm.dot(pg, pg)


def _pseudo_grad_norm_kernel(meta_ref, c_ref, x_ref, g_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    n, lo, hi = meta_ref[0], meta_ref[1], meta_ref[2]
    c = c_ref[0]
    x = x_ref[:]
    g = g_ref[:]
    R, L = x.shape
    base = i * R * L
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = base + rows * L + cols
    in_window = (gidx >= lo) & (gidx < hi)
    right = g + c
    left = g - c
    at_zero = jnp.where(right < 0.0, right, jnp.where(left > 0.0, left, 0.0))
    inside = jnp.where(x != 0.0, g + jnp.sign(x) * c, at_zero)
    pg = jnp.where(in_window, inside, g)
    o_ref[:] = pg

    is_tail = base + R * L > n

    @pl.when(~is_tail)
    def _():
        acc_ref[0, 0] += jnp.sum(pg * pg)

    @pl.when(is_tail)
    def _():
        acc_ref[0, 0] += jnp.sum(jnp.where(gidx < n, pg * pg, 0.0))


def owlqn_pseudo_gradient_norm_pallas(x, g, c, start, end, interpret=False):
    """(pg, pg . pg) in one pass — the solver's post-search OWL-QN epilogue
    needs the carried gnorm2 and would otherwise re-read pg for the dot."""
    n = x.shape[0]
    x2, nb, BR = _to_blocks(x)
    g2, _, _ = _to_blocks(g)
    meta = jnp.asarray([n, start, end], jnp.int32)
    c_a = jnp.asarray([c], x.dtype)
    blk = lambda: pl.BlockSpec((BR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, acc = pallas_call32(
        _pseudo_grad_norm_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
        ],
        out_specs=(blk(), pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(meta, c_a, x2, g2)
    return out.reshape(-1)[:n], acc[0, 0].astype(x.dtype)


def owlqn_pseudo_gradient_norm(x, g, c, start, end):
    """Dispatching wrapper for (pg, ||pg||^2); shard-local + one psum
    under kernels_on_mesh."""
    if x.shape[0] >= MIN_FUSED_N and _use_pallas(x, g):
        ma = active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            mesh, ax = ma
            if x.shape[0] % (ma[0].devices.size * LANES) == 0:
                from jax.sharding import PartitionSpec as P

                def local(c_, x_, g_):
                    off = jax.lax.axis_index(ax) * x_.shape[0]
                    pg, nn = owlqn_pseudo_gradient_norm_pallas(
                        x_, g_, c_[0], start - off, end - off,
                        interpret=interpret_mode(),
                    )
                    return pg, jax.lax.psum(nn, ax)

                return _shard_map(local, mesh, (P(), P(ax), P(ax)), (P(ax), P()))(
                    jnp.asarray([c], x.dtype), x, g
                )
        else:
            return owlqn_pseudo_gradient_norm_pallas(x, g, c, start, end,
                                                     interpret=interpret_mode())
    return owlqn_pseudo_gradient_norm_ref(x, g, c, start, end)


def owlqn_pseudo_gradient(x, g, c, start, end):
    if x.shape[0] >= MIN_FUSED_N and _use_pallas(x, g):
        ma = active_mesh()
        if ma is not None and ma[0].devices.size > 1:
            mesh, ax = ma
            if x.shape[0] % (ma[0].devices.size * LANES) == 0:
                from jax.sharding import PartitionSpec as P

                def local(c_, x_, g_):
                    off = jax.lax.axis_index(ax) * x_.shape[0]
                    return owlqn_pseudo_gradient_pallas(
                        x_, g_, c_[0], start - off, end - off,
                        interpret=interpret_mode(),
                    )

                return _shard_map(local, mesh, (P(), P(ax), P(ax)), P(ax))(
                    jnp.asarray([c], x.dtype), x, g
                )
        else:
            return owlqn_pseudo_gradient_pallas(x, g, c, start, end,
                                                interpret=interpret_mode())
    return owlqn_pseudo_gradient_ref(x, g, c, start, end)


# ---------------------------------------------------------------------------
# fused axpy + dot: z = y + c*x;  also return z . w   (one HBM pass)
# ---------------------------------------------------------------------------


def axpy_dot_ref(y, x, c, w):
    z = y + c * x
    return z, jnp.dot(z, w, precision="highest")


def _axpy_dot_kernel(c_ref, y_ref, x_ref, w_ref, z_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    z = y_ref[:] + c_ref[0] * x_ref[:]
    z_ref[:] = z
    acc_ref[0, 0] += jnp.sum(z * w_ref[:])


def axpy_dot_pallas(y, x, c, w, interpret=False):
    n = y.shape[0]
    y2, nb = _pad_to_block(y)
    x2, _ = _pad_to_block(x)
    w2, _ = _pad_to_block(w)  # padding contributes 0 to the dot
    c_a = jnp.asarray([c], y.dtype)
    z, acc = pallas_call32(
        _axpy_dot_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(y2.shape, y.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(c_a, y2, x2, w2)
    return z.reshape(-1)[:n], acc[0, 0].astype(y.dtype)


def axpy_dot(y, x, c, w):
    if _use_pallas(y, x, w):
        return axpy_dot_pallas(y, x, c, w, interpret=interpret_mode())
    return axpy_dot_ref(y, x, c, w)


# ---------------------------------------------------------------------------
# fused correction-pair + Gram update (the solver's history hot path)
# ---------------------------------------------------------------------------
#
# One iteration of the compact-two-loop solver needs, after the line search
# accepts (x, gx):
#
#   s = x - xp,  y = gx - gp,  d0 = -gx,
#   SP = S_new @ [y; s; d0]   ([m, 3], with S_new = S ring-updated at `end`)
#   YP = Y_new @ [y; s; d0]
#
# Composed from jnp ops that is: materialize s, y, the [n, 3] stack Z, and
# stream S and Y against Z — ~10 extra vector-passes beyond the algorithmic
# minimum.  The kernel below reads x, xp, gx, gp and the S/Y history blocks
# once, writes s and y, and accumulates all 6m reductions in SMEM across
# the sequential grid, substituting the fresh (s, y) for ring row `end`
# in-register (so callers pass the PRE-update history).
#
# Only used when OWL-QN is off (under OWL-QN d0 = -pg, a different vector);
# the jnp path in solver.propagate_core covers that regime.


def pair_gram_sd_ref(stp, d, gx, gp, S, Y, end, with_gp=False):
    """jnp oracle of the s = stp*d kernel form ([m, n] history inputs)."""
    return pair_gram_ref(
        stp * d + jnp.zeros_like(d), jnp.zeros_like(d), gx, gp, S, Y, end,
        with_gp=with_gp,
    )


def pair_gram_ref(x, xp, gx, gp, S, Y, end, with_gp=False):
    """jnp oracle: returns (s, y, SP, YP) with ring row `end` replaced.

    ``with_gp`` appends a 4th product column (. gp) — the basis the damped
    update's scalar reconstruction needs (see solver.update_pair and the
    damped branch of solver.propagate_core)."""
    s = x - xp
    y = gx - gp
    d0 = -gx
    S_new = S.at[end].set(s)
    Y_new = Y.at[end].set(y)
    cols = [y, s, d0] + ([gp] if with_gp else [])
    Z = jnp.stack(cols, axis=1)
    SP = jnp.matmul(S_new, Z, precision="highest")
    YP = jnp.matmul(Y_new, Z, precision="highest")
    return s, y, SP, YP


def _pair_gram_kernel(
    end_ref, nrows_ref, stp_ref, d_ref, gx_ref, gp_ref, S_ref, Y_ref,
    s_ref, y_ref, sp_ref, yp_ref, *, with_gp=False
):
    # s_ref / y_ref are (1, br, L) views of ring row `end` of the ALIASED
    # output stacks (scalar-prefetch index map): the new pair is written
    # in place, no separate buffers + dynamic-update-slice pass.
    i = pl.program_id(0)
    m, R, L = S_ref.shape
    ncols = 4 if with_gp else 3

    @pl.when(i == 0)
    def _():
        for j in range(m):
            for c in range(ncols):
                sp_ref[j, c] = jnp.float32(0.0)
                yp_ref[j, c] = jnp.float32(0.0)

    end = end_ref[0]
    gx = gx_ref[:]
    # s = x - xp = stp * d exactly on the projection-free path
    # (src/core.rs:155-164); saves reading x and xp.  The x-not-changed
    # detection this bypasses comes from the trial kernel's `changed`
    # accumulator instead (see solver.propagate_core).
    s = stp_ref[0] * d_ref[:]
    gp = gp_ref[:]
    y = gx - gp
    d0 = -gx
    s_ref[0] = s.astype(s_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)

    # tail-block rows past the array read garbage and must be masked out
    # of every reduction (their s/y writes are dropped by Mosaic).  The
    # mask select costs ~1/3 of the kernel's VPU work, so it is
    # predicated to run ONLY on a partial tail block.
    is_tail = (i + 1) * R > nrows_ref[0]

    def accumulate(msum):
        for j in range(m):  # m is small and static: unrolled
            is_end = j == end
            # widen in registers: bf16 history reads at half HBM traffic
            Sj = jnp.where(is_end, s, S_ref[j].astype(s.dtype))
            Yj = jnp.where(is_end, y, Y_ref[j].astype(y.dtype))
            sp_ref[j, 0] += msum(Sj * y)
            sp_ref[j, 1] += msum(Sj * s)
            sp_ref[j, 2] += msum(Sj * d0)
            yp_ref[j, 0] += msum(Yj * y)
            yp_ref[j, 1] += msum(Yj * s)
            yp_ref[j, 2] += msum(Yj * d0)
            if with_gp:
                # the damped update's extra basis column (. gp): gp is
                # already streaming through VMEM, so the 2m extra product
                # chains cost VPU work only, zero HBM traffic
                sp_ref[j, 3] += msum(Sj * gp)
                yp_ref[j, 3] += msum(Yj * gp)

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum)

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        accumulate(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))


def pair_gram_update_pallas(stp, d, gx, gp, S, Y, end, interpret=False,
                            with_gp=False):
    """S, Y must be in ring-major [m, n/128, 128] storage (free views of
    the History stacks; a [m, n] layout would force a whole-history copy
    per call — see core.History).  The correction pair
    s = stp * d (exact on the projection-free path), y = gx - gp is
    written IN PLACE into ring row ``end`` of the (aliased, donated)
    stacks; returns (S_new, Y_new, SP, YP).

    ``with_gp=True`` appends a 4th accumulator column of products against
    gp ([m, 4] outputs) — the bilinear basis from which the damped update
    (src/lbfgs.rs:658-691) reconstructs every post-damping Gram quantity
    with [m]-scalar math (see solver.propagate_core); costs VPU FMAs only.

    Under ``kernels_on_mesh`` the kernel runs shard-local over the history
    row axis via shard_map, and the [m, 3] SMEM accumulators combine with
    one psum — the identical collective round the jnp gram pass pays."""
    ma = active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        mesh, ax = ma
        from jax.sharding import PartitionSpec as P

        def local(stp_, end_, d_, gx_, gp_, S_, Y_):
            S_new, Y_new, SP, YP = _pair_gram_single(
                stp_[0], d_, gx_, gp_, S_, Y_, end_[0], interpret, with_gp
            )
            return S_new, Y_new, jax.lax.psum(SP, ax), jax.lax.psum(YP, ax)

        vec, hist, rep = P(ax), P(None, ax, None), P()
        return _shard_map(
            local, mesh,
            (rep, rep, vec, vec, vec, hist, hist),
            (hist, hist, rep, rep),
        )(
            jnp.asarray([stp], d.dtype), jnp.asarray([end], jnp.int32),
            d, gx, gp, S, Y,
        )
    return _pair_gram_single(stp, d, gx, gp, S, Y, end, interpret, with_gp)


def _pair_gram_single(stp, d, gx, gp, S, Y, end, interpret=False, with_gp=False):
    n = d.shape[0]
    m = S.shape[0]
    if not lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned; use pair_gram_ref")
    rows = n // LANES
    if S.shape != (m, rows, LANES):
        raise ValueError(f"history must be ring-major [m, {rows}, {LANES}], got {S.shape}")
    nb, br = kernel_grid(n, HIST_BLOCK_ROWS)
    ncols = 4 if with_gp else 3
    as2 = lambda v: v.reshape(rows, LANES)
    stp_a = jnp.asarray([stp], d.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # end, nrows (used by the output index maps)
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, br, LANES), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec((1, br, LANES), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    import functools

    S_new, Y_new, SP, YP = pallas_call32(
        functools.partial(_pair_gram_kernel, with_gp=with_gp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, rows, LANES), S.dtype),
            jax.ShapeDtypeStruct((m, rows, LANES), S.dtype),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
            jax.ShapeDtypeStruct((m, ncols), jnp.float32),
        ),
        # inputs counted incl. the prefetch scalars: S is 6, Y is 7
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
    )(
        jnp.asarray([end], jnp.int32),
        jnp.asarray([rows], jnp.int32),
        stp_a,
        as2(d),
        as2(gx),
        as2(gp),
        S,
        Y,
    )
    return S_new, Y_new, SP.astype(d.dtype), YP.astype(d.dtype)


def _mesh_divides(rows: int) -> bool:
    """Under an active multi-device mesh, every device must get whole
    lane-aligned row blocks of the ring-major history."""
    ma = active_mesh()
    if ma is None:
        return True
    return rows % ma[0].devices.size == 0


def can_pair_gram_pallas(x: Array, S: Array, *more: Array) -> bool:
    """``more``: any extra per-element operand streams the objective binds
    (factory extras) — they must pass the same dtype/backend gate."""
    return (
        _use_pallas(x, *more)
        and _kernel_enabled("pair_gram")
        and x.shape[0] >= MIN_FUSED_N
        and S.ndim == 3
        and S.dtype in (jnp.float32, jnp.bfloat16)
        and lane_aligned(x.shape[0])
        and _mesh_divides(S.shape[1])
    )


# ---------------------------------------------------------------------------
# Pair + Gram update, OWL-QN form (s = x - xp, d0 = -pg)
# ---------------------------------------------------------------------------
#
# Under OWL-QN the trial point is orthant-projected, so s = x - xp is NOT
# stp*d, and the two-loop input direction is the pseudo-gradient's
# steepest descent d0 = -pg — the projection-free kernel above cannot be
# reused.  Composed from jnp ops the OWL-QN pair update is the single
# heaviest pass of the iteration: s/y materialization, two ring writes,
# the [n, 3] Z stack, and two [m, n] @ [n, 3] matvecs — ~1.7 GB/iter at
# n = 2^24, which is why round 1's OWL-QN at-scale throughput sat at
# ~40% of the unregularized solver's.  This kernel reads
# (x, xp, gx, gp, pg) and the history blocks once, writes the pair in
# place, and accumulates the 6m products in SMEM.
# Reference semantics: IterationData::update (src/lbfgs.rs:640-656) with
# the OWL-QN d0 of src/lbfgs.rs:536-537.


def pair_gram_xg_ref(x, xp, gx, gp, pg, S, Y, end):
    """jnp oracle: (s, y, SP, YP) with d0 = -pg ([m, n] history inputs)."""
    s = x - xp
    y = gx - gp
    d0 = -pg
    S_new = S.at[end].set(s)
    Y_new = Y.at[end].set(y)
    Z = jnp.stack([y, s, d0], axis=1)
    SP = jnp.matmul(S_new, Z, precision="highest")
    YP = jnp.matmul(Y_new, Z, precision="highest")
    return s, y, SP, YP


def _pair_gram_xg_kernel(
    end_ref, nrows_ref, x_ref, xp_ref, gx_ref, gp_ref, pg_ref, S_ref, Y_ref,
    s_ref, y_ref, sp_ref, yp_ref
):
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        for j in range(m):
            for c in range(3):
                sp_ref[j, c] = jnp.float32(0.0)
                yp_ref[j, c] = jnp.float32(0.0)

    end = end_ref[0]
    s = x_ref[:] - xp_ref[:]
    y = gx_ref[:] - gp_ref[:]
    d0 = -pg_ref[:]
    s_ref[0] = s.astype(s_ref.dtype)
    y_ref[0] = y.astype(y_ref.dtype)

    is_tail = (i + 1) * R > nrows_ref[0]

    def accumulate(msum):
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

    @pl.when(~is_tail)
    def _():
        accumulate(jnp.sum)

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        accumulate(lambda a: jnp.sum(jnp.where(valid, a, 0.0)))


def pair_gram_update_xg_pallas(x, xp, gx, gp, pg, S, Y, end, interpret=False):
    """OWL-QN pair + Gram update: s = x - xp, y = gx - gp, d0 = -pg, one
    streaming pass; the pair lands in ring row ``end`` of the aliased
    stacks.  Shard-local under ``kernels_on_mesh`` with one psum for the
    [m, 3] accumulators."""
    ma = active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        mesh, ax = ma
        from jax.sharding import PartitionSpec as P

        def local(end_, x_, xp_, gx_, gp_, pg_, S_, Y_):
            S_new, Y_new, SP, YP = _pair_gram_xg_single(
                x_, xp_, gx_, gp_, pg_, S_, Y_, end_[0], interpret
            )
            return S_new, Y_new, jax.lax.psum(SP, ax), jax.lax.psum(YP, ax)

        vec, hist, rep = P(ax), P(None, ax, None), P()
        return _shard_map(
            local, mesh,
            (rep, vec, vec, vec, vec, vec, hist, hist),
            (hist, hist, rep, rep),
        )(jnp.asarray([end], jnp.int32), x, xp, gx, gp, pg, S, Y)
    return _pair_gram_xg_single(x, xp, gx, gp, pg, S, Y, end, interpret)


def _pair_gram_xg_single(x, xp, gx, gp, pg, S, Y, end, interpret=False):
    n = x.shape[0]
    m = S.shape[0]
    if not lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned; use pair_gram_xg_ref")
    rows = n // LANES
    if S.shape != (m, rows, LANES):
        raise ValueError(f"history must be ring-major [m, {rows}, {LANES}], got {S.shape}")
    nb, br = kernel_grid(n, HIST_BLOCK_ROWS)
    as2 = lambda v: v.reshape(rows, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # end, nrows
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, br, LANES), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec((1, br, LANES), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    S_new, Y_new, SP, YP = pallas_call32(
        _pair_gram_xg_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, rows, LANES), S.dtype),
            jax.ShapeDtypeStruct((m, rows, LANES), S.dtype),
            jax.ShapeDtypeStruct((m, 3), jnp.float32),
            jax.ShapeDtypeStruct((m, 3), jnp.float32),
        ),
        # inputs counted incl. the prefetch scalars: S is 7, Y is 8
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(
        jnp.asarray([end], jnp.int32),
        jnp.asarray([rows], jnp.int32),
        as2(x), as2(xp), as2(gx), as2(gp), as2(pg),
        S, Y,
    )
    return S_new, Y_new, SP.astype(x.dtype), YP.astype(x.dtype)


# ---------------------------------------------------------------------------
# fused history combine: r = gamma*d + coef_s @ S + coef_y @ Y
# ---------------------------------------------------------------------------
#
# The compact two-loop's output direction.  As two [m] @ [m, n] matvecs plus
# an axpy, XLA materializes the partial products; the kernel forms the whole
# linear combination per block in registers — reads S, Y, d once, writes r.


def combine_ref(d, S, Y, gamma, coef_s, coef_y):
    return (
        gamma * d
        + jnp.matmul(coef_s, S, precision="highest")
        + jnp.matmul(coef_y, Y, precision="highest")
    )


def _chained_combination(dtype, m, cs_ref, cy_ref, S_ref, Y_ref):
    """coef_s @ S + coef_y @ Y over the ring axis as FOUR independent FMA
    chains (S/Y x even/odd j) — the unrolled per-element reduction is the
    VPU's critical path in the combine kernels, and splitting it from one
    13-deep chain to four ~3-deep chains is pure latency hiding (the
    reassociation is tolerance-level; tests compare at 2e-6 rel)."""
    accS = cs_ref[0] * S_ref[0].astype(dtype)
    accY = cy_ref[0] * Y_ref[0].astype(dtype)
    if m >= 2:
        accS1 = cs_ref[1] * S_ref[1].astype(dtype)
        accY1 = cy_ref[1] * Y_ref[1].astype(dtype)
        for j in range(2, m):  # m small + static: unrolled
            if j % 2 == 0:
                accS += cs_ref[j] * S_ref[j].astype(dtype)
                accY += cy_ref[j] * Y_ref[j].astype(dtype)
            else:
                accS1 += cs_ref[j] * S_ref[j].astype(dtype)
                accY1 += cy_ref[j] * Y_ref[j].astype(dtype)
        accS += accS1
        accY += accY1
    return accS + accY


def _combine_fix_kernel(end_ref, nrows_ref, gamma_ref, cs_ref,
                        cy_ref, ab_ref, d_ref, S_ref, Y_ref,
                        r_ref, yfix_ref, rr_ref):
    """Combine + DAMPED-ROW PERSIST: identical to ``_combine_kernel``
    (the damping is already folded into the CALLER's coefficients — see
    solver's row-fix rewrite), plus one aliased ring-row write
    ``Y[end] <- ca*Y[end] + cb*d`` where ``d`` is the combine's own
    vector operand (the NEW gradient on the damped plain path:
    y_d = (a-b)*y + b*gx).  Replaces the solver's separate 3-stream
    row-blend pass with VPU work on streams already in VMEM."""
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = jnp.float32(0.0)
        rr_ref[0, 1] = jnp.float32(0.0)

    dv = d_ref[:]
    acc = _chained_combination(dv.dtype, m, cs_ref, cy_ref, S_ref, Y_ref)
    acc = gamma_ref[0] * dv + acc
    r_ref[:] = acc

    end = end_ref[0]
    ca, cb = ab_ref[0], ab_ref[1]
    # m is small + static: select the end row without a gather
    yrow = Y_ref[0].astype(dv.dtype)
    for j in range(1, m):
        yrow = jnp.where(j == end, Y_ref[j].astype(dv.dtype), yrow)
    yfix_ref[0] = (ca * yrow + cb * dv).astype(yfix_ref.dtype)

    is_tail = (i + 1) * R > nrows_ref[0]

    @pl.when(~is_tail)
    def _():
        rr_ref[0, 0] += jnp.sum(acc * acc)
        rr_ref[0, 1] += jnp.sum(acc * dv)

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        rr_ref[0, 0] += jnp.sum(jnp.where(valid, acc * acc, 0.0))
        rr_ref[0, 1] += jnp.sum(jnp.where(valid, acc * dv, 0.0))


def combine_fix_ref(d, S, Y, gamma, coef_s, coef_y, end, ca, cb):
    """jnp oracle ([m, n] history): combine on the PRE-fix history with
    caller-rewritten coefficients, plus the persisted damped row."""
    r = combine_ref(d, S, Y, gamma, coef_s, coef_y)
    Y_new = Y.at[end].set(ca * Y[end] + cb * d)
    return r, jnp.dot(r, r), jnp.dot(r, d), Y_new


def combine_fix_pallas(d, S, Y, gamma, coef_s, coef_y, end, ca, cb,
                       interpret=False):
    """Combine + damped-row persist (see ``_combine_fix_kernel``).

    Returns (r, ||r||^2, r . d, Y_new) with the damped row landed in
    place in the aliased Y stack.  Shard-local + psum under
    kernels_on_mesh."""
    ma = active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        mesh, ax = ma
        from jax.sharding import PartitionSpec as P

        def local(gamma_, cs_, cy_, ab_, end_, d_, S_, Y_):
            r, rr, rd, Y_new = _combine_fix_single(
                d_, S_, Y_, gamma_[0], cs_, cy_, end_[0], ab_[0], ab_[1],
                interpret,
            )
            return r, jax.lax.psum(rr, ax), jax.lax.psum(rd, ax), Y_new

        vec, hist, rep = P(ax), P(None, ax, None), P()
        return _shard_map(
            local, mesh, (rep, rep, rep, rep, rep, vec, hist, hist),
            (vec, rep, rep, hist)
        )(
            jnp.asarray([gamma], d.dtype),
            jnp.asarray(coef_s, d.dtype),
            jnp.asarray(coef_y, d.dtype),
            jnp.stack([jnp.asarray(ca, d.dtype), jnp.asarray(cb, d.dtype)]),
            jnp.asarray([end], jnp.int32),
            d, S, Y,
        )
    return _combine_fix_single(d, S, Y, gamma, coef_s, coef_y, end, ca, cb,
                               interpret)


def _combine_fix_single(d, S, Y, gamma, coef_s, coef_y, end, ca, cb,
                        interpret=False):
    n = d.shape[0]
    m = S.shape[0]
    if not lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned; use combine_fix_ref")
    rows = n // LANES
    if S.shape != (m, rows, LANES):
        raise ValueError(f"history must be ring-major [m, {rows}, {LANES}], got {S.shape}")
    nb, br = kernel_grid(n, HIST_BLOCK_ROWS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # end, nrows (the row-write index map)
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gamma
            pl.BlockSpec(memory_space=pltpu.SMEM),   # coef_s
            pl.BlockSpec(memory_space=pltpu.SMEM),   # coef_y
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (ca, cb)
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
            pl.BlockSpec((m, br, LANES), lambda i, e, r: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, LANES), lambda i, e, r: (i, 0)),
            pl.BlockSpec((1, br, LANES), lambda i, e, r: (e[0], i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    r, Y_new, rr = pallas_call32(
        _combine_fix_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), d.dtype),
            jax.ShapeDtypeStruct((m, rows, LANES), Y.dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        # inputs counted incl. the prefetch scalars: Y is 8 -> Y_new (1)
        input_output_aliases={8: 1},
        interpret=interpret,
    )(
        jnp.asarray([end], jnp.int32),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray([gamma], d.dtype),
        jnp.asarray(coef_s, d.dtype),
        jnp.asarray(coef_y, d.dtype),
        jnp.stack([jnp.asarray(ca, d.dtype), jnp.asarray(cb, d.dtype)]),
        d.reshape(rows, LANES),
        S,
        Y,
    )
    return (r.reshape(-1), rr[0, 0].astype(d.dtype),
            rr[0, 1].astype(d.dtype), Y_new)


def _combine_kernel(gamma_ref, nrows_ref, cs_ref, cy_ref, d_ref, S_ref, Y_ref, r_ref, rr_ref):
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = jnp.float32(0.0)
        rr_ref[0, 1] = jnp.float32(0.0)

    dv = d_ref[:]
    # independent accumulation chains so the VPU is not serialized on one
    # 13-deep FMA dependency per element — measured 326 GB/s with a single
    # chain; two chains (S and Y) fixed most of it, and interleaving each
    # by stride 2 (4 chains of depth ~m/2) hides the remaining latency.
    # The reassociation is tolerance-level (12 O(1) terms).
    acc = _chained_combination(dv.dtype, m, cs_ref, cy_ref, S_ref, Y_ref)
    acc = gamma_ref[0] * dv + acc
    r_ref[:] = acc

    # ||r||^2 and r . d as free byproducts of the pass: the first feeds
    # dnorm / the next step size (src/lbfgs.rs:544-551); when the caller
    # passes the gradient as ``d`` (sign folded into gamma) the second IS
    # dginit = d_new . g for the next line search (src/core.rs:78-92).
    # Tail-row masking is predicated to the partial tail block only.
    is_tail = (i + 1) * R > nrows_ref[0]

    @pl.when(~is_tail)
    def _():
        rr_ref[0, 0] += jnp.sum(acc * acc)
        rr_ref[0, 1] += jnp.sum(acc * dv)

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        rr_ref[0, 0] += jnp.sum(jnp.where(valid, acc * acc, 0.0))
        rr_ref[0, 1] += jnp.sum(jnp.where(valid, acc * dv, 0.0))


def combine_pallas(d, S, Y, gamma, coef_s, coef_y, interpret=False):
    """S, Y must be ring-major [m, n/128, 128] (see pair_gram_update_pallas).

    Returns (r, ||r||^2, r . d); shard-local + psum under kernels_on_mesh."""
    ma = active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        mesh, ax = ma
        from jax.sharding import PartitionSpec as P

        def local(gamma_, cs_, cy_, d_, S_, Y_):
            r, rr, rd = _combine_single(d_, S_, Y_, gamma_[0], cs_, cy_, interpret)
            return r, jax.lax.psum(rr, ax), jax.lax.psum(rd, ax)

        vec, hist, rep = P(ax), P(None, ax, None), P()
        return _shard_map(
            local, mesh, (rep, rep, rep, vec, hist, hist), (vec, rep, rep)
        )(
            jnp.asarray([gamma], d.dtype),
            jnp.asarray(coef_s, d.dtype),
            jnp.asarray(coef_y, d.dtype),
            d, S, Y,
        )
    return _combine_single(d, S, Y, gamma, coef_s, coef_y, interpret)


def _combine_single(d, S, Y, gamma, coef_s, coef_y, interpret=False):
    n = d.shape[0]
    m = S.shape[0]
    if not lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned; use combine_ref")
    rows = n // LANES
    if S.shape != (m, rows, LANES):
        raise ValueError(f"history must be ring-major [m, {rows}, {LANES}], got {S.shape}")
    nb, br = kernel_grid(n, HIST_BLOCK_ROWS)
    vblk = lambda: pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hblk = lambda: pl.BlockSpec((m, br, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    r, rr = pallas_call32(
        _combine_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vblk(),
            hblk(),
            hblk(),
        ],
        out_specs=(vblk(), pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), d.dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray([gamma], d.dtype),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray(coef_s, d.dtype),
        jnp.asarray(coef_y, d.dtype),
        d.reshape(rows, LANES),
        S,
        Y,
    )
    return r.reshape(-1), rr[0, 0].astype(d.dtype), rr[0, 1].astype(d.dtype)


def _combine_ow_kernel(
    gamma_ref, nrows_ref, lohi_ref, cs_ref, cy_ref, d_ref, S_ref, Y_ref,
    r_ref, rr_ref
):
    """OWL-QN combine: the direction constraint d <- pi(d; -pg) inside the
    [start, end) window (``src/orthantwise.rs:140-161``) applied IN the
    combine pass — ``d_ref`` holds the pseudo-gradient pg (the two-loop q
    input with the sign folded into gamma), which is exactly the vector
    the constraint projects against.  Composed, the constraint was a
    separate read-modify-write of d plus a ||d||^2 read plus a pg . d
    read for the next search's dginit: ~384 MB/iter at n = 2^24, all
    byproducts here."""
    i = pl.program_id(0)
    m, R, L = S_ref.shape

    @pl.when(i == 0)
    def _():
        for c in range(3):
            rr_ref[0, c] = jnp.float32(0.0)

    dv = d_ref[:]
    acc = _chained_combination(dv.dtype, m, cs_ref, cy_ref, S_ref, Y_ref)
    acc = gamma_ref[0] * dv + acc

    # constrain: zero components whose sign disagrees with -pg, inside
    # the global [lo, hi) window (shard-translated by the caller)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    gidx = (i * R + rows) * L + cols
    in_win = (gidx >= lohi_ref[0]) & (gidx < lohi_ref[1])
    kill = in_win & (_msign(acc) != _msign(-dv))
    rc = jnp.where(kill, jnp.zeros_like(acc), acc)
    r_ref[:] = rc

    # byproducts: ||r||^2 PRE-constrain (dnorm parity, src/lbfgs.rs:544
    # fires before the constraint), ||rc||^2 (zero-direction check), and
    # rc . pg (dginit of the NEXT search, src/core.rs:78-92)
    is_tail = (i + 1) * R > nrows_ref[0]

    @pl.when(~is_tail)
    def _():
        rr_ref[0, 0] += jnp.sum(acc * acc)
        rr_ref[0, 1] += jnp.sum(rc * rc)
        rr_ref[0, 2] += jnp.sum(rc * dv)

    @pl.when(is_tail)
    def _():
        grow = i * R + jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        valid = grow < nrows_ref[0]
        rr_ref[0, 0] += jnp.sum(jnp.where(valid, acc * acc, 0.0))
        rr_ref[0, 1] += jnp.sum(jnp.where(valid, rc * rc, 0.0))
        rr_ref[0, 2] += jnp.sum(jnp.where(valid, rc * dv, 0.0))


def combine_ow_ref(d, S, Y, gamma, coef_s, coef_y, start, end):
    """jnp oracle: (rc, rr_pre, rc2, rcd) with d = pg ([m, n] history)."""
    r = combine_ref(d, S, Y, gamma, coef_s, coef_y)
    idx = jnp.arange(d.shape[0], dtype=jnp.int32)
    in_win = (idx >= start) & (idx < end)
    ms = lambda v: jnp.where(jnp.isnan(v), jnp.zeros_like(v), jnp.sign(v))
    rc = jnp.where(in_win & (ms(r) != ms(-d)), jnp.zeros_like(r), r)
    return rc, jnp.dot(r, r), jnp.dot(rc, rc), jnp.dot(rc, d)


def combine_ow_pallas(d, S, Y, gamma, coef_s, coef_y, start, end, interpret=False):
    """OWL-QN combine + in-pass direction constraint.  ``d`` is the
    pseudo-gradient pg; returns (rc, ||r||^2 pre-constrain, ||rc||^2,
    rc . pg).  Shard-local + psum under kernels_on_mesh, with the global
    window translated per shard."""
    ma = active_mesh()
    if ma is not None and ma[0].devices.size > 1:
        mesh, ax = ma
        from jax.sharding import PartitionSpec as P

        def local(gamma_, cs_, cy_, d_, S_, Y_):
            off = jax.lax.axis_index(ax) * d_.shape[0]
            rc, a, b, c = _combine_ow_single(
                d_, S_, Y_, gamma_[0], cs_, cy_, start - off, end - off,
                interpret,
            )
            part = jax.lax.psum(jnp.stack([a, b, c]), ax)
            return rc, part

        vec, hist, rep = P(ax), P(None, ax, None), P()
        rc, part = _shard_map(
            local, mesh, (rep, rep, rep, vec, hist, hist), (vec, rep)
        )(
            jnp.asarray([gamma], d.dtype),
            jnp.asarray(coef_s, d.dtype),
            jnp.asarray(coef_y, d.dtype),
            d, S, Y,
        )
        return rc, part[0], part[1], part[2]
    return _combine_ow_single(d, S, Y, gamma, coef_s, coef_y, start, end, interpret)


def _combine_ow_single(d, S, Y, gamma, coef_s, coef_y, start, end, interpret=False):
    n = d.shape[0]
    m = S.shape[0]
    if not lane_aligned(n):
        raise ValueError(f"n={n} is not lane-aligned; use combine_ow_ref")
    rows = n // LANES
    if S.shape != (m, rows, LANES):
        raise ValueError(f"history must be ring-major [m, {rows}, {LANES}], got {S.shape}")
    nb, br = kernel_grid(n, HIST_BLOCK_ROWS)
    vblk = lambda: pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hblk = lambda: pl.BlockSpec((m, br, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    r, rr = pallas_call32(
        _combine_ow_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vblk(),
            hblk(),
            hblk(),
        ],
        out_specs=(vblk(), pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), d.dtype),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray([gamma], d.dtype),
        jnp.asarray([rows], jnp.int32),
        jnp.asarray([start, end], jnp.int32),
        jnp.asarray(coef_s, d.dtype),
        jnp.asarray(coef_y, d.dtype),
        d.reshape(rows, LANES),
        S,
        Y,
    )
    a = lambda c: rr[0, c].astype(d.dtype)
    return r.reshape(-1), a(0), a(1), a(2)


def can_combine_pallas(d: Array, S: Array, *more: Array) -> bool:
    """``more``: extra operand streams (see ``can_pair_gram_pallas``)."""
    return (
        _use_pallas(d, *more)
        and _kernel_enabled("combine")
        and d.shape[0] >= MIN_FUSED_N
        and S.ndim == 3
        and S.dtype in (jnp.float32, jnp.bfloat16)
        and lane_aligned(d.shape[0])
        and _mesh_divides(S.shape[1])
    )
