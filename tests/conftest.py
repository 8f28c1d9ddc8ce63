"""Test environment: force CPU with 8 virtual devices for sharding tests.

Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's TPU plugin force-selects itself via a sitecustomize hook
# (jax.config.update("jax_platforms", "axon,cpu") at interpreter start), which
# overrides the JAX_PLATFORMS env var.  Re-override to CPU for tests: CI needs
# the 8 virtual devices above for sharding tests, plus deterministic float32.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sim_track():
    """The Sim_Track scenario fully built (map + path + speed profile)."""
    from multi_purpose_mpc_tpu.config import sim_track_preset
    from multi_purpose_mpc_tpu.utils.maps import add_obstacles_host, load_grid_map
    from multi_purpose_mpc_tpu.ops.path import build_reference_path

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    map_cfg, path_cfg, model_cfg, mpc_cfg, speed_cfg, obstacles = sim_track_preset(
        asset_dir=os.path.join(repo, "assets", "maps"))
    grid = load_grid_map(map_cfg)
    path = build_reference_path(grid, path_cfg)
    if obstacles:
        grid = add_obstacles_host(grid, map_cfg.origin, map_cfg.resolution, obstacles)
    return dict(grid=grid, path=path, map_cfg=map_cfg, path_cfg=path_cfg,
                model_cfg=model_cfg, mpc_cfg=mpc_cfg, speed_cfg=speed_cfg,
                obstacles=obstacles)
