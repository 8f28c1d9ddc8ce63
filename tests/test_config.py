"""Config-surface contracts that live at construction time."""

import dataclasses
import warnings

import pytest

from multi_purpose_mpc_tpu.config import MPCConfig, SolverConfig


def test_budget_regularizer_warning_on_cost_flat_R():
    """VERDICT r4 next #7: a user cranking solver accuracy on the
    reference's cost-flat weights (R[1] == 0) must be told why driving
    degrades (measured r4: converged solves on cost-flat kappa drive worse;
    the production budget is the implicit regularizer)."""
    # production defaults on reference weights: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        MPCConfig()

    # cranked budget + cost-flat R: warns
    with pytest.warns(UserWarning, match="implicit regularizer"):
        MPCConfig(solver=SolverConfig(iterations=200, rho_updates=10))

    # escalation on + cost-flat R: warns
    with pytest.warns(UserWarning, match="implicit regularizer"):
        MPCConfig(solver=SolverConfig(escalate_lanes=64))

    # strictly convex R: cranking is legal and silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        MPCConfig(R=(0.5, 0.01),
                  solver=SolverConfig(iterations=200, rho_updates=10))
        MPCConfig(R=(0.5, 0.01), solver=SolverConfig(escalate_lanes=64))


def test_time_optimal_config_pins_kappa():
    """time_optimal_config defaults keep R strictly convex (the r3 sweep
    determinism finding) and move all state cost to terminal time."""
    from multi_purpose_mpc_tpu.config import time_optimal_config

    cfg = time_optimal_config(MPCConfig())
    assert cfg.Q == (0.0, 0.0, 0.0)
    assert cfg.QN[2] > 0.0
    assert cfg.R[1] > 0.0
