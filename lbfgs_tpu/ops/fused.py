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
BLOCK_ROWS = 512  # rows of 128 lanes per grid step -> 64K elems/block


def _pad_to_block(v: Array) -> tuple[Array, int]:
    n = v.shape[0]
    per_block = BLOCK_ROWS * LANES
    nb = -(-n // per_block)
    padded = nb * per_block
    if padded != n:
        v = jnp.pad(v, (0, padded - n))
    return v.reshape(nb * BLOCK_ROWS, LANES), nb


def _use_pallas(*arrays: Array) -> bool:
    if not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
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
    idx = jnp.arange(x.shape[0])
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

    out = pl.pallas_call(
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
    if _use_pallas(xp, d, wp):
        return owlqn_trial_step_pallas(xp, d, wp, stp, start, end)
    return owlqn_trial_step_ref(xp, d, wp, stp, start, end)


# ---------------------------------------------------------------------------
# OWL-QN pseudo-gradient (Eq. 4)
# ---------------------------------------------------------------------------


def owlqn_pseudo_gradient_ref(x, g, c, start, end):
    idx = jnp.arange(x.shape[0])
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
    out = pl.pallas_call(
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


def owlqn_pseudo_gradient(x, g, c, start, end):
    if _use_pallas(x, g):
        return owlqn_pseudo_gradient_pallas(x, g, c, start, end)
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
    z, acc = pl.pallas_call(
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
        return axpy_dot_pallas(y, x, c, w)
    return axpy_dot_ref(y, x, c, w)
