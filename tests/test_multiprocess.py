"""Multi-PROCESS validation: 2 OS processes, jax.distributed + gloo CPU
collectives, one global 2-device mesh (VERDICT round-2 item #5).

This is the first real exercise of ``parallel.init_distributed``
(sharding.py) beyond a single address space: each worker process owns ONE
CPU device, the [n] vector is sharded globally across both, and
``minimize_jit`` runs the full L-BFGS loop with every dot-product
reduction crossing the process boundary as a gloo all-reduce.  The test
asserts (a) both workers complete and agree bitwise with each other and
(b) the distributed trajectory lands on the single-process trajectory
(same iteration count; fx to f64 reassociation tolerance — the 2-shard
reduction split reassociates sums, the same contract as
tests/test_sharding.py pins for the single-process mesh).

The reference has no analog (single-address-space Rust, SURVEY.md §2.3);
the scaling north star (BASELINE.md) requires the multi-host code path
to be exercised somewhere, and a 2-process CPU run is the only form this
environment permits.
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
sys.path.insert(0, {repo!r})
from lbfgs_tpu.parallel import init_distributed, make_mesh, vector_sharding

init_distributed(
    coordinator_address=f"localhost:{{port}}", num_processes=2, process_id=pid
)
jax.config.update("jax_enable_x64", True)
import numpy as np
from lbfgs_tpu.minimize import minimize_jit
from lbfgs_tpu.models import rosenbrock
from lbfgs_tpu.params import LbfgsParams

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

n = 128
mesh = make_mesh()  # spans the GLOBAL device set
sh = vector_sharding(mesh)
x0_np = np.zeros(n)
x0_np[0::2] = -1.2
x0_np[1::2] = 1.0
x0 = jax.make_array_from_callback((n,), sh, lambda idx: x0_np[idx])

rep = minimize_jit(LbfgsParams(), x0, rosenbrock.value_and_grad)
print(
    f"RESULT pid={{pid}} fx={{float(rep.fx)!r}} niter={{int(rep.niter)}}",
    flush=True,
)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    sys.platform != "linux", reason="gloo CPU collectives exercised on linux"
)
def test_two_process_minimize_matches_single_process(tmp_path):
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

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) fx=(\S+) niter=(\d+)", out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), int(m.group(3)))
    assert set(results) == {0, 1}
    # replicated outputs must agree bitwise across processes
    assert results[0] == results[1]

    # single-process reference trajectory (this process, unsharded)
    import jax
    import numpy as np
    from lbfgs_tpu.minimize import minimize_jit
    from lbfgs_tpu.models import rosenbrock
    from lbfgs_tpu.params import LbfgsParams

    x0 = np.zeros(128)
    x0[0::2] = -1.2
    x0[1::2] = 1.0
    rep = minimize_jit(LbfgsParams(), jax.numpy.asarray(x0), rosenbrock.value_and_grad)
    fx_d, niter_d = results[0]
    assert niter_d == int(rep.niter)
    assert fx_d == pytest.approx(float(rep.fx), rel=1e-6, abs=1e-10)
