"""Checkpoint/resume for long multi-keyframe solves.

The reference has no checkpointing (SURVEY.md §5: run-once-and-exit; its
closest analog is append-only CSV logs). For 100-1000+ keyframe solves on
pod slices, solver state (poses, landmarks, damping, iteration) is saved
with orbax (async-capable, sharding-aware) with an npz fallback, and
`solve_multiview_resumable` restarts from the last round.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _tree_to_numpy(tree: Any):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any, step: int | None = None):
    """Save a pytree checkpoint. Uses orbax when importable, else npz."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        # Serialize as an index-keyed dict: orbax restores containers as
        # plain dicts (alphabetical), which would scramble NamedTuple
        # leaf order on restore.
        leaves = jax.tree.leaves(_tree_to_numpy(tree))
        ckptr.save(path, {f"leaf_{i:04d}": l for i, l in enumerate(leaves)})
        if step is not None:
            with open(path + ".step", "w") as f:
                f.write(str(step))
        return "orbax"
    except Exception:
        flat, treedef = jax.tree.flatten(_tree_to_numpy(tree))
        np.savez(
            path + ".npz",
            *flat,
            __treedef__=np.frombuffer(str(treedef).encode(), np.uint8),
            __step__=np.asarray(-1 if step is None else step),
        )
        return "npz"


def load_checkpoint(path: str, like: Any):
    """Restore a pytree checkpoint saved by save_checkpoint; `like` gives
    the structure (and shapes for orbax restore)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(path)
            leaves_like, treedef = jax.tree.flatten(like)
            leaves = [restored[f"leaf_{i:04d}"] for i in range(len(leaves_like))]
            step = None
            if os.path.exists(path + ".step"):
                step = int(open(path + ".step").read())
            return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves]), step
    except Exception:
        pass
    data = np.load(path + ".npz")
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(leaves_like))]
    step = int(data["__step__"])
    return jax.tree.unflatten(treedef, leaves), (None if step < 0 else step)


def solve_multiview_resumable(
    prob,
    ckpt_path: str,
    total_iters: int = 40,
    iters_per_round: int = 10,
    mesh=None,
):
    """Multi-keyframe solve in checkpointed rounds: each round runs
    `iters_per_round` LM iterations, persists (problem, round) and can be
    resumed after interruption by calling again with the same path."""
    from ..models import multiview as mv

    start_round = 0
    if os.path.exists(ckpt_path) or os.path.exists(ckpt_path + ".npz"):
        prob, step = load_checkpoint(ckpt_path, prob)
        start_round = 0 if step is None else step

    rounds = max(total_iters // iters_per_round, 1)
    costs_all = []
    for r in range(start_round, rounds):
        if mesh is not None:
            from ..parallel import dist_ba

            prob, costs = dist_ba.solve_multiview_sharded(
                prob, mesh, num_iters=iters_per_round
            )
        else:
            prob, costs = mv.solve_multiview(prob, num_iters=iters_per_round)
        costs_all.append(np.asarray(costs))
        save_checkpoint(ckpt_path, prob, step=r + 1)
    return prob, (np.concatenate(costs_all) if costs_all else np.zeros(0))
