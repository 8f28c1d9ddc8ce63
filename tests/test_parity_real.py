"""Real_Track oracle-driven elementwise parity (VERDICT r3 #6).

The Sim_Track parity protocol (tests/test_parity.py) never exercised the
NON-CIRCULAR seam: clamped horizon gathers past the last waypoint, boundary
behavior, and the final-waypoint approach (SURVEY.md Q4; the reference
hard-exits there, reference_path.py:366-369).  This test runs the same
oracle-driven protocol — each framework step driven from the float64
oracle's exact pre-step state — over >= 200 Real_Track steps ENDING AT THE
PATH END, so every clamp-seam state the controller can visit is compared
elementwise.  Reference math: /root/reference/src/simulation.py:58-88, 134.

Strictly convex weights (R = (0.5, 0.01), Q2 = 0.1) pin the QP where
elementwise comparison is well-posed, exactly as in test_parity.py (see its
docstring for what 1e-3 can and cannot pin at cost-flat weights).
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_purpose_mpc_tpu.config import SolverConfig, real_track_preset
from multi_purpose_mpc_tpu.models.bicycle import init_car_state
from multi_purpose_mpc_tpu.ops.path import build_reference_path
from multi_purpose_mpc_tpu.ops.speed_profile import compute_speed_profile
from multi_purpose_mpc_tpu.simulation import _sim_step
from multi_purpose_mpc_tpu.utils.maps import load_grid_map
from tests.oracle.sim import path_to_dict, simulate_oracle

pytestmark = pytest.mark.slow

T = 280  # oracle breaks at the path end; >= 200 steps reach it from s0


@pytest.fixture(scope="module")
def real_scenario():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    map_cfg, path_cfg, model_cfg, mpc_cfg, speed_cfg, _ = (
        real_track_preset(asset_dir=os.path.join(repo, "assets", "maps")))
    solver = SolverConfig(iterations=200, rho_updates=10, polish_iters=40)
    mpc_cfg = dataclasses.replace(
        mpc_cfg, Q=(1.0, 0.1, 0.0), QN=(1.0, 0.1, 0.0), R=(0.5, 0.01),
        solver=solver, solver_backend="xla")
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    path = compute_speed_profile(path, speed_cfg)
    return dict(grid=grid, path=path, mpc_cfg=mpc_cfg, model_cfg=model_cfg)


def test_real_track_seam_parity(real_scenario):
    sc = real_scenario
    path, grid = sc["path"], sc["grid"]
    mpc_cfg, model_cfg = sc["mpc_cfg"], sc["model_cfg"]
    assert not bool(path.circular)

    # start far enough back that the run covers >= 200 steps AND reaches the
    # end of the path (the oracle loop breaks at s >= length)
    L = float(path.length)
    s0 = max(0.0, L - 10.5)
    occ = np.asarray(grid.occ)
    origin = (float(grid.origin[0]), float(grid.origin[1]))
    olog = simulate_oracle(occ, origin, float(grid.resolution),
                           path_to_dict(path), mpc_cfg, model_cfg, T,
                           K=mpc_cfg.n_scan_samples, S=mpc_cfg.max_segments,
                           qp_solver="ip", s0=s0)
    To = len(olog["x"])
    assert To >= 200, f"seam window too short: {To} steps"
    assert olog["s"][-1] >= L, "oracle run must reach the path end"

    base = init_car_state(path, mpc_cfg.N)
    step = jax.jit(lambda st: _sim_step(st, path, grid, mpc_cfg, model_cfg))

    rows = []
    for t in range(To):
        x, y, psi, s, u_seq, ic = olog["pre"][t]
        st = base.replace(
            x=jnp.float32(x), y=jnp.float32(y), psi=jnp.float32(psi),
            s=jnp.float32(s),
            u_seq=jnp.asarray(u_seq.reshape(-1), jnp.float32),
            infeasibility_count=jnp.int32(ic))
        new_st, log = step(st)
        rows.append((float(log.v), float(log.delta), float(new_st.x),
                     float(new_st.y), float(new_st.psi), float(new_st.s),
                     bool(log.ok), float(log.r_prim)))
    fw = np.asarray([r[:6] for r in rows], np.float64)
    fw_ok = np.asarray([r[6] for r in rows], bool)
    fw_rp = np.asarray([r[7] for r in rows], np.float64)

    # 1. acceptance agreement on every step incl. the clamp seam
    agree = fw_ok == olog["solved"][:To]
    assert agree.all(), f"acceptance disagrees at steps {np.flatnonzero(~agree)}"
    both = fw_ok & olog["solved"][:To]
    assert both.mean() > 0.9

    # 2. BASELINE 1e-3 bar on trajectory coordinates + speed command
    for name, col, key in (("v", 0, "v"), ("x'", 2, "x"), ("y'", 3, "y"),
                           ("s'", 5, "s")):
        d = np.abs(fw[:, col] - olog[key][:To])[both]
        assert d.max() <= 1e-3, f"{name}: max |diff| {d.max():.2e} > 1e-3"

    # 3. steering/heading at the QP's cost resolution (test_parity.py bars)
    tight = both & (fw_rp < 1e-4)
    assert tight.sum() >= 0.8 * To
    for name, col, key, b_tight, b_all in (
            ("delta", 1, "delta", 5e-3, 1e-1),
            ("psi'", 4, "psi", 2e-3, 5e-2)):
        d = np.abs(fw[:, col] - olog[key][:To])
        assert np.median(d[both]) <= 2e-4
        assert d[tight].max() <= b_tight
        assert d[both].max() <= b_all
