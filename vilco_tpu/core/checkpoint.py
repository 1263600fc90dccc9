"""Checkpoint save/restore.

Replaces the reference's torch.save dicts
({task, epoch, state_dict, scheduler, optimizer, reg_params},
MQ/train_cl.py:300-315) with flax msgpack serialization of explicit pytrees.
CL state (fisher/importance stacks, rehearsal-memory index, prompt pool
inside params, memory bank) is part of the saved tree so resume restores the
full episode (SURVEY.md section 5 checkpoint/resume).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Dict[str, Any]):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        pickle.dump(host_tree, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_msgpack(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, tree)))


def restore_msgpack(path: str, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_orbax(path: str, tree) -> None:
    """Orbax (tensorstore-backed) checkpoint of an array pytree — the
    TPU-native format for large/sharded params: per-array chunked storage,
    OCDBT, restores straight to sharded device arrays on a mesh. Use for
    params/opt-state; the pickled episode sidecar (rehearsal memory index,
    BwF history) stays in save_checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def restore_orbax(path: str, target=None):
    """Restore an orbax checkpoint; `target` (an abstract or concrete
    pytree) restores with matching structure/sharding when given."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
                target,
            )
            return ckptr.restore(os.path.abspath(path), abstract)
        return ckptr.restore(os.path.abspath(path))
