"""Checkpoint save/restore.

Replaces the reference's torch.save pickles
({task, epoch, state_dict, scheduler, optimizer, reg_params},
MQ/train_cl.py:300-315) with a SAFE self-describing format: a JSON
structure manifest (tagging dicts/tuples/lists/scalars, including non-str
dict keys) plus an npz of all array leaves, in one zip file. Unlike
pickle it executes no code on load and is stable across library versions;
unlike plain flax-msgpack it round-trips tuples, None, and int dict keys
exactly (the CL episode state needs all three). CL state (fisher/importance
stacks, rehearsal-memory index, prompt pool inside params, memory bank) is
part of the saved tree so resume restores the full episode (SURVEY.md
section 5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import jax
import numpy as np


# ------------------------------------------------ tagged tree <-> manifest

def _np_safe(a: np.ndarray):
    """npz round-trips only builtin numpy dtypes; exotic ones (ml_dtypes
    bfloat16/float8: kind 'V') silently degrade to raw void — store their
    bytes as a same-width unsigned view plus the dtype name."""
    if a.dtype.kind != "V":
        return a, None
    return a.view(np.dtype(f"u{a.dtype.itemsize}")), a.dtype.name


def _encode(obj, arrays: List[np.ndarray]):
    if isinstance(obj, (np.ndarray, jax.Array)) or isinstance(obj, np.generic):
        a, exotic = _np_safe(np.asarray(obj))
        arrays.append(a)
        node = {"__t": "arr", "i": len(arrays) - 1}
        if exotic:
            node["dt"] = exotic
        return node
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"__t": "raw", "v": obj}
    if isinstance(obj, tuple):
        return {"__t": "tup", "v": [_encode(x, arrays) for x in obj]}
    if isinstance(obj, list):
        return {"__t": "list", "v": [_encode(x, arrays) for x in obj]}
    if isinstance(obj, dict):
        return {"__t": "dict",
                "v": [[_encode(k, arrays), _encode(v, arrays)]
                      for k, v in obj.items()]}
    # torch tensors ride along in the reference's split-pkl video dicts
    # (scripts/split_mq.py keeps per-clip segmentation_labels as torch
    # tensors) and land here via the rehearsal-memory save — store as
    # plain arrays (loads back as np; our pipeline consumes either)
    if type(obj).__name__ == "Tensor" and hasattr(obj, "detach"):
        a, exotic = _np_safe(np.asarray(obj.detach().cpu()))
        arrays.append(a)
        node = {"__t": "arr", "i": len(arrays) - 1}
        if exotic:
            node["dt"] = exotic
        return node
    raise TypeError(
        f"checkpoint: unsupported leaf type {type(obj).__name__}; "
        "convert to arrays / dicts / tuples before saving")


def _decode(node, arrays):
    t = node["__t"]
    if t == "arr":
        a = arrays[node["i"]]
        if "dt" in node:
            import ml_dtypes

            a = a.view(getattr(ml_dtypes, node["dt"]))
        return a
    if t == "raw":
        return node["v"]
    if t == "tup":
        return tuple(_decode(x, arrays) for x in node["v"])
    if t == "list":
        return [_decode(x, arrays) for x in node["v"]]
    if t == "dict":
        return {_decode(k, arrays): _decode(v, arrays)
                for k, v in node["v"]}
    raise ValueError(f"checkpoint: unknown node tag {t!r}")


def save_checkpoint(path: str, tree: Dict[str, Any], arrays_format: str = "npz"):
    """arrays_format="npz" packs array leaves into the manifest zip
    itself; "orbax" stores them in a tensorstore/OCDBT directory at
    `path + ".arrays"` (per-array chunked storage, the TPU-native layout
    for large/sharded params) and the zip carries only the manifest.
    `load_checkpoint` auto-detects either layout."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: List[np.ndarray] = []
    manifest = _encode(tree, arrays)
    if arrays_format == "orbax":
        # arrays first, manifest last: a crash mid-save leaves no
        # manifest, so the checkpoint is simply not seen by loaders
        save_orbax(path + ".arrays", {f"a{i}": a
                                      for i, a in enumerate(arrays)})
        payload = {}
    elif arrays_format == "npz":
        payload = {f"a{i}": a for i, a in enumerate(arrays)}
    else:
        raise ValueError(f"unknown arrays_format {arrays_format!r}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __manifest__=np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8),
            **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":            # not a zip: a legacy pickle checkpoint
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    arrays = {int(k[1:]): data[k] for k in data.files if k != "__manifest__"}
    if not arrays and os.path.isdir(path + ".arrays"):
        restored = restore_orbax(path + ".arrays")
        arrays = {int(k[1:]): v for k, v in restored.items()}
    return _decode(manifest, arrays)


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


def save_orbax(path: str, tree) -> None:
    """Orbax (tensorstore-backed) checkpoint of an array pytree — the
    TPU-native format for large/sharded params: per-array chunked storage,
    OCDBT, restores straight to sharded device arrays on a mesh. The
    array backend of `save_checkpoint(arrays_format="orbax")`; the
    structure manifest (rehearsal memory index, BwF history, scalars)
    stays in the zip."""
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
