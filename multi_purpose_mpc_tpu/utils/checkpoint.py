"""Fleet checkpoint / resume (SURVEY.md §5: the reference has none — sim
state is 4 floats in object attributes; ours is a pytree snapshot).

The complete simulator state is the :class:`CarState` pytree (plus optional
log buffers), so save/restore is a flat array dump.  All helpers are
pytree-GENERIC: the LiDAR-in-the-loop fleet checkpoints its
``(CarState, known_occ)`` carry the same way (tested bitwise in
tests/test_utils.py).  Uses ``orbax`` when available for production
checkpoints, with a plain ``.npz`` fallback that has no extra dependencies —
both store the same tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multi_purpose_mpc_tpu.models.bicycle import CarState


def _flatten_with_names(tree):
    leaves, treedef = jax.tree.flatten(tree)
    names = [f"leaf_{i}" for i in range(len(leaves))]
    return leaves, names, treedef


def save_fleet_state(path: str, state: CarState, step: int = 0) -> None:
    """Snapshot a (possibly batched, possibly sharded) fleet state to disk."""
    leaves, names, _ = _flatten_with_names(state)
    arrays = {n: np.asarray(l) for n, l in zip(names, leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez(path, **arrays)


def load_fleet_state(path: str, like: CarState) -> tuple[CarState, int]:
    """Restore a fleet state; ``like`` supplies the tree structure/dtypes."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, names, treedef = _flatten_with_names(like)
    restored = [jnp.asarray(data[n], l.dtype) for n, l in zip(names, leaves)]
    step = int(data["__step__"])
    return jax.tree.unflatten(treedef, restored), step


def save_fleet_state_orbax(dirpath: str, state: CarState, step: int = 0) -> None:
    """Orbax-backed checkpoint for long Monte-Carlo runs (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(dirpath), f"step_{step}"),
               jax.tree.map(jnp.asarray, state))
    ckptr.wait_until_finished()


def load_fleet_state_orbax(dirpath: str, like: CarState, step: int) -> CarState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(dirpath), f"step_{step}"),
                         target=like)
