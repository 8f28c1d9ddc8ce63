"""Device-mesh sharding for fleet-scale Monte-Carlo MPC (SURVEY.md §2.3).

The reference is a single-threaded CPU program; the scale axis of the new
framework is the **fleet batch** — thousands of independent car/scenario
lanes.  Lanes never interact, so the sharding story is the simple-and-optimal
one from the GSPMD playbook:

* a 1-D ``Mesh`` over all devices with a single ``"fleet"`` axis;
* every per-lane array (CarState leaves, logs) sharded on its leading batch
  dimension; path/grid data replicated;
* **zero collectives in the hot loop** — XLA partitions the vmapped scan
  trivially; cross-device reductions appear only in metric aggregation
  (``fleet_metrics``) where a ``psum``-style all-reduce rides the ICI.

Multi-host scale-out uses the same code: ``jax.distributed.initialize`` +
the global mesh makes lanes span slices (DCN enters only at checkpoint /
metric time).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FLEET_AXIS = "fleet"


def fleet_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with a single fleet axis."""
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.asarray(devices), (FLEET_AXIS,))


def fleet_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the fleet axis."""
    return NamedSharding(mesh, P(FLEET_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_fleet_state(state, mesh: Mesh):
    """Place a batched CarState pytree with its leading axis sharded."""
    sh = fleet_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def replicate(tree, mesh: Mesh):
    """Replicate path/grid data on every device."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def round_up_batch(batch: int, mesh: Mesh) -> int:
    """Lanes must divide evenly across devices; pad the fleet if needed."""
    n = mesh.devices.size
    return ((batch + n - 1) // n) * n


def fleet_metrics(log, length: jnp.ndarray):
    """Cross-fleet aggregates computed on-device.

    Under a sharded fleet these reductions lower to XLA all-reduces over the
    mesh (the only collectives in the system).  Returns a small dict of
    scalars — progress, completion, failure and solver health — the
    observability summary the reference printed ad hoc (SURVEY.md §5).
    """
    active = log.active
    solved = log.ok & active
    n_active_steps = jnp.maximum(active.sum(), 1)
    return {
        "mean_progress": jnp.mean(log.s[-1] / length),
        "laps_done": jnp.mean((log.s[-1] >= length).astype(jnp.float32)),
        "qp_solve_rate": solved.sum() / n_active_steps,
        "mean_speed": (log.v * active).sum() / n_active_steps,
        "max_abs_e_y": jnp.max(jnp.abs(log.e_y * active)),
    }
