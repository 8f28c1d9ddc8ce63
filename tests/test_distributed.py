"""Real multi-process ``jax.distributed`` integration test (VERDICT r3 #3).

The reference has no distributed story at all (SURVEY.md §2.3); the
framework's multi-host seam (``parallel/mesh.py``) had until now only been
logic-tested.  This test actually EXECUTES it: two OS processes, a localhost
coordinator, 4 virtual CPU devices each, one global 8-device fleet mesh, and
``simulate_fleet_sharded`` running the closed loop across both — then each
process's local lane block is checked against a single-process run of the
same 8-device sharded program (identical per-device programs, so the match
is tight).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.config import SimConfig
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.parallel.fleet import simulate_fleet_sharded
from multi_purpose_mpc_tpu.parallel.mesh import fleet_mesh
from multi_purpose_mpc_tpu.simulation import init_fleet

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fleet(tmp_path, sim_track):
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    # the workers must form their own distributed cluster
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)

    outs = [str(tmp_path / f"worker{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{logs[i]}")

    # single-process reference: the SAME sharded program on the 8-virtual-
    # device mesh of this test process (same per-device lane blocks)
    B, T = 8, 4
    path = compute_speed_profile(sim_track["path"], sim_track["speed_cfg"])
    fleet = init_fleet(path, sim_track["mpc_cfg"].N, B,
                       e_y0=jnp.linspace(-0.03, 0.03, B))
    ref = simulate_fleet_sharded(fleet_mesh(), sim_track["grid"], path,
                                 sim_track["mpc_cfg"],
                                 sim_track["model_cfg"],
                                 SimConfig(max_steps=T), fleet)
    ref_s = np.asarray(ref.final_state.s)
    ref_x = np.asarray(ref.log.x)
    ref_ok = np.asarray(ref.log.ok)

    covered = np.zeros(B, bool)
    for i in range(2):
        d = np.load(outs[i])
        sl = slice(int(d["lo"]), int(d["hi"]))
        assert not covered[sl].any(), "processes claim overlapping lanes"
        covered[sl] = True
        np.testing.assert_allclose(d["s"], ref_s[sl], atol=1e-6,
                                   err_msg=f"worker {i} final s")
        np.testing.assert_allclose(d["x"], ref_x[:, sl], atol=1e-6,
                                   err_msg=f"worker {i} x log")
        np.testing.assert_array_equal(d["ok"], ref_ok[:, sl])
    assert covered.all(), "the two processes' lane blocks must tile the fleet"
