"""Real 2-process jax.distributed bring-up for parallel/hosts.py.

config_from_env parsing is covered in tests/test_sharding.py; this test
actually *executes* maybe_initialize_distributed() across two local
processes (torchrun-style env, the reference's launch convention —
/root/reference/train_net.py:107-111) and runs a global psum over the
combined 2-device mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)  # one device per process
import jax
jax.config.update("jax_platforms", "cpu")
from gdb_nerf_tpu.parallel.hosts import maybe_initialize_distributed

ok = maybe_initialize_distributed()
assert ok, "multi-host init did not run"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np

mesh = Mesh(np.array(jax.devices()), ("data",))
f = jax.jit(
    jax.shard_map(
        lambda x: jax.lax.psum(x, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
)
local = jnp.full((1, 4), float(jax.process_index() + 1))
import jax.experimental.multihost_utils as mh
gl = jax.make_array_from_process_local_data(
    jax.sharding.NamedSharding(mesh, P("data")), np.asarray(local)
)
out = np.asarray(jax.device_get(f(gl)))
np.testing.assert_allclose(out, 3.0)  # 1 + 2 across processes
print(f"proc {jax.process_index()}: psum ok", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# (no pytest.mark.timeout: pytest-timeout isn't installed here, the mark
# was a silent no-op — the communicate(timeout=220) below is the real bound)
def test_two_process_bringup(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env.update(
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            WORLD_SIZE="2",
            RANK=str(rank),
            PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host bring-up timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "psum ok" in out, out
