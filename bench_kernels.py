"""Per-kernel standalone throughput: the PERF.md kernel table, reproducibly.

Each kernel is timed as ITERS dependent calls inside ONE jitted
executable (chained through a real data dependency so XLA cannot CSE or
reorder them), synced by reading a scalar through the relay.  The model
bytes column is the kernel's algorithmic HBM traffic (f32 vectors, bf16
history), so GB/s = model_MB * iters / elapsed and %SoL is against the
v5e's ~819 GB/s.

Relay-proofing (both learned the hard way): operands are generated ON
DEVICE (host->device transfers of ~1 GB wedge the tunnel) and passed to
the jitted thunk as ARGUMENTS (a closure-captured array is embedded as an
HLO constant, and a 400 MB compile request hits the relay's HTTP 413
body limit).

Run on TPU:  python bench_kernels.py [--n 16777216] [--iters 30]
Prints one JSON line per kernel.
"""

from __future__ import annotations

import argparse
import json
import os

# keep the in-jit ascent-warning host callback out of traced programs:
# benchmarks legitimately quiet runtime warnings, and the axon PJRT
# plugin rejects host callbacks outright (UNIMPLEMENTED)
os.environ.setdefault("LBFGS_TPU_NO_RUNTIME_WARN", "1")
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax import lax

HBM_SOL_GBPS = 819.0  # v5e
INTERP = bool(os.environ.get("LBFGS_TPU_KERNELS_INTERPRET"))


def _inputs(n, m=6, hdtype=jnp.bfloat16):
    rows = n // 128

    @jax.jit
    def mk():
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        xp = jax.random.normal(ks[0], (n,), jnp.float32) * 0.1 - 1.0
        d = jax.random.normal(ks[1], (n,), jnp.float32) * 0.01
        gx = jax.random.normal(ks[2], (n,), jnp.float32)
        gp = jax.random.normal(ks[3], (n,), jnp.float32)
        S = (jax.random.normal(ks[4], (m, rows, 128), jnp.float32) * 0.1).astype(hdtype)
        Y = (jax.random.normal(ks[5], (m, rows, 128), jnp.float32) * 0.1).astype(hdtype)
        cs = jax.random.normal(ks[6], (m,), jnp.float32) * 0.1
        cy = jax.random.normal(ks[7], (m,), jnp.float32) * 0.1
        return xp, d, gx, gp, S, Y, cs, cy

    out = mk()
    float(out[0][0])  # sync the generation before timing anything
    return out


def _model_mb(name, n, m, hbytes):
    f32 = 4 * n
    hist = 2 * m * hbytes * n       # read S + Y
    rows2 = 2 * hbytes * n          # write s + y ring rows
    return {
        "null": 1024 * 4 * 2,                    # ~8 KB: overhead probe
        "null2": 1024 * 4 * 4,                   # ~16 KB: two-launch probe
        "probe": 2 * f32,                       # reads xp, d
        "trial": 4 * f32,                       # reads xp, d; writes x, g
        "pair_gram": 3 * f32 + hist + rows2,    # reads d, gx, gp
        "pair_gram_gp": 3 * f32 + hist + rows2,
        "combine": 2 * f32 + hist,              # reads d + S, Y; writes r
        "combine_ow": 2 * f32 + hist,
        "trial_pair_gram": 5 * f32 + hist + rows2,  # + writes x, g
        # + one extra read+write pass (2*f32) of loop glue for the x
        # perturbation that defeats CSE — counted so GB/s stays honest
        "pair_gram_xg": 5 * f32 + hist + rows2 + 2 * f32,
        # OWL-QN one-kernel epilogue: reads xp,d,gp,pg; writes x,g,pg
        "owlqn_tpg": 7 * f32 + hist + rows2,
        "probe_pg": 3 * f32,                    # reads xp, d, pg
    }[name] / 1e6


def _build(name, iters, m):
    """Return run(xp, d, gx, gp, S, Y, cs, cy) for jax.jit — operands are
    parameters, never closure captures."""
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.ops import fused

    def run(xp, d, gx, gp, S, Y, cs, cy):
        if name in ("null", "null2"):
            # overhead calibration: a one-block Pallas kernel with ~zero
            # HBM traffic in the same loop-carried harness — its ms/call
            # is the per-call dispatch + carry overhead the real kernels
            # also pay here but NOT when running back-to-back inside
            # propagate (see PERF.md's standalone-table caveat)
            import jax.experimental.pallas as pl

            def kern(x_ref, o_ref):
                o_ref[:] = x_ref[:] + 1.0

            tiny = d[:1024].reshape(8, 128)

            launches = 2 if name == "null2" else 1

            def body(k, carry):
                out = carry
                for _ in range(launches):
                    out = pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((8, 128), out.dtype),
                        interpret=INTERP,
                    )(out)
                return out

            return lax.fori_loop(0, iters, body, tiny)[0]
        if name == "probe":
            # scalar outputs only; chain stp through ft (value-independent cost)
            def body(k, stp):
                ft, dg = rosenbrock.probe_pallas(xp, d, stp, interpret=INTERP)
                return 0.3 + 1e-30 * ft

            return lax.fori_loop(0, iters, body, jnp.float32(0.3))
        if name == "trial":
            def body(k, carry):
                xt, *_ = rosenbrock.trial_pallas(carry, d, 0.3, interpret=INTERP)
                return xt

            return lax.fori_loop(0, iters, body, xp)[0]
        if name in ("pair_gram", "pair_gram_gp"):
            wg = name == "pair_gram_gp"

            def body(k, carry):
                S_, Y_, stp = carry
                S2, Y2, SP, YP = fused.pair_gram_update_pallas(
                    stp, d, gx, gp, S_, Y_, k % m, interpret=INTERP, with_gp=wg
                )
                return (S2, Y2, 0.3 + 1e-30 * SP[0, 0])

            return lax.fori_loop(0, iters, body, (S, Y, jnp.float32(0.3)))[2]
        if name == "combine":
            def body(k, carry):
                r, rr, rd = fused.combine_pallas(
                    carry, S, Y, 0.9, cs, cy, interpret=INTERP
                )
                return r

            return lax.fori_loop(0, iters, body, d)[0]
        if name == "combine_ow":
            n = d.shape[0]

            def body(k, carry):
                rc, *_ = fused.combine_ow_pallas(
                    carry, S, Y, -0.9, cs, cy, 0, n - 1, interpret=INTERP
                )
                return rc

            return lax.fori_loop(0, iters, body, d)[0]
        if name == "trial_pair_gram":
            def body(k, carry):
                xp_, S_, Y_ = carry
                out = rosenbrock.trial_pair_gram_pallas(
                    xp_, d, gp, 0.3, S_, Y_, k % m, interpret=INTERP
                )
                return (out[0], out[7], out[8])

            return lax.fori_loop(0, iters, body, (xp, S, Y))[0][0]
        if name == "pair_gram_xg":
            def body(k, carry):
                x_, S_, Y_ = carry
                S2, Y2, SP, YP = fused.pair_gram_update_xg_pallas(
                    x_, xp, gx, gp, d, S_, Y_, k % m, interpret=INTERP
                )
                return (x_ + 1e-30 * SP[0, 0], S2, Y2)

            return lax.fori_loop(0, iters, body, (gx, S, Y))[0][0]
        if name == "owlqn_tpg":
            n = d.shape[0]

            def body(k, carry):
                xp_, gp_, pg_, S_, Y_ = carry
                (x2, g2, pg2, S2, Y2, SP, YP, xx, pgpg, ch) = (
                    rosenbrock.owlqn_trial_pair_gram_pallas(
                        xp_, d, gp_, pg_, 0.3, 1.0, 0, n - 1, S_, Y_,
                        k % m, interpret=INTERP,
                    )
                )
                return (x2, g2, pg2, S2, Y2)

            return lax.fori_loop(0, iters, body, (xp, gx, gp, S, Y))[0][0]
        if name == "probe_pg":
            n = d.shape[0]

            def body(k, stp):
                ft, dg = rosenbrock.owlqn_probe_pg_pallas(
                    xp, d, gp, stp, 1.0, 0, n - 1, interpret=INTERP
                )
                return 0.3 + 1e-30 * ft

            return lax.fori_loop(0, iters, body, jnp.float32(0.3))
        raise ValueError(f"unknown kernel {name}")

    return run


def bench_one(name, n, iters, m=6):
    ops = _inputs(n, m)
    hbytes = jnp.dtype(ops[4].dtype).itemsize
    model_mb = _model_mb(name, n, m, hbytes)

    fn = jax.jit(_build(name, iters, m))
    float(jnp.asarray(fn(*ops)).reshape(-1)[0])  # warm + sync
    t0 = time.perf_counter()
    out = fn(*ops)
    float(jnp.asarray(out).reshape(-1)[0])  # sync via scalar read
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    gbps = model_mb * iters / dt / 1e3
    return {
        "kernel": name,
        "n": n,
        "ms_per_call": round(ms, 4),
        "model_MB": round(model_mb, 1),
        "GBps": round(gbps, 1),
        "pct_SoL": round(100 * gbps / HBM_SOL_GBPS, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--kernels",
        default="probe,trial,pair_gram,combine,trial_pair_gram,pair_gram_xg,combine_ow,pair_gram_gp",
    )
    args = ap.parse_args()
    for k in args.kernels.split(","):
        print(json.dumps(bench_one(k, args.n, args.iters)), flush=True)


if __name__ == "__main__":
    main()
