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


def load_params_into(path: str, target_params):
    """Initialize `target_params` from a checkpoint's params, keeping the
    fresh init for leaves that are missing or shape-mismatched (e.g. a
    cls head sized for a different task count) — the fine-tune entry
    semantics of NLQ/train_ft.py (load pretrained trunk, new heads).
    """
    import jax.numpy as jnp

    tree = load_checkpoint(path)
    src = tree.get("params", tree)

    flat_tgt = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    loaded = skipped = 0
    out = {}
    for kpath, leaf in flat_tgt.items():
        cand = flat_src.get(kpath)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out[kpath] = jnp.asarray(cand)
            loaded += 1
        else:
            out[kpath] = leaf
            skipped += 1
    treedef = jax.tree_util.tree_structure(target_params)
    result = jax.tree_util.tree_unflatten(
        treedef, [out[k] for k, _ in
                  jax.tree_util.tree_flatten_with_path(target_params)[0]]
    )
    import logging

    logging.getLogger("vilco.ckpt").info(
        "init-from %s: %d leaves loaded, %d kept fresh", path, loaded,
        skipped,
    )
    return result


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
