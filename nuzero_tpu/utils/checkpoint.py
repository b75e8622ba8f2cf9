"""Orbax checkpointing (ref ``Utils/Functions/loading_utlis.py`` +
``Training/AlphaZero.py:157-210,453-458``).

The reference pickles model/optimizer/scheduler *objects* plus torch state
dicts per ``<name>_<step>_cp`` file and supports "auto" latest-checkpoint
discovery (``loading_utlis.py:21-27``).  Here a checkpoint is one Orbax
save of the full training pytree: params, optimizer state, step, PRNG key,
and (optionally) the device-resident replay buffer — everything needed for
bit-exact resume.  Model *code* is reconstructed from configs (saved
alongside, ref ``AlphaZero.py:184-187``) rather than pickled objects.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


# Checkpoint tree-layout version.  Bumped when the saved pytree structure
# changes incompatibly (v2: ReplayBuffer stores packed states in a
# ``states`` field; v1 buffers stored observation tensors in ``obs``).
# Restores of a mismatched version fail with a clear message instead of an
# Orbax tree-structure error.  Same-version LEAF-SHAPE drift (e.g. the
# SCS packed replay state dimension grew when ``SCSState`` gained the
# ``vp`` field) is caught by the shape pre-check in
# :func:`restore_checkpoint` rather than by a version bump, so old
# checkpoints of unaffected games (TTT, SCS without a saved buffer) stay
# loadable.
FORMAT_VERSION = 2


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"step_{step:08d}")


def _format_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), "FORMAT")


def save_checkpoint(root: str, step: int, tree: Any) -> str:
    """Multi-controller: EVERY process must call this with the same tree
    (Orbax writes each process's addressable shards and coordinates the
    commit); the side-car FORMAT file is written by process 0 only."""
    path = _ckpt_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    if jax.process_index() == 0:
        with open(_format_path(root), "w") as f:
            f.write(f"{FORMAT_VERSION}\n")
    return path


def latest_step(root: str) -> Optional[int]:
    """'auto' discovery (ref ``loading_utlis.py:21-24``)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(root: str, step: int | str = "auto", target: Any = None):
    """Restore the pytree saved at ``step`` ('auto' = latest)."""
    if step == "auto":
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _ckpt_dir(root, int(step))
    fmt_file = _format_path(root)
    if os.path.exists(fmt_file):
        with open(fmt_file) as f:
            saved_fmt = int(f.read().strip() or 0)
        if saved_fmt != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint at {path} was saved with tree-layout version "
                f"{saved_fmt}; this build reads version {FORMAT_VERSION}. "
                "Re-train or convert the run (buffer-bearing v1 checkpoints "
                "stored observations, v2 stores packed states)."
            )
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        # Pre-check saved leaf shapes against the target so same-version
        # layout drift (e.g. a pre-``vp`` SCS replay buffer whose packed
        # state dimension no longer matches this build's ``SCSState``)
        # fails with a clear message naming the leaves, not an opaque
        # Orbax shape error mid-restore.
        try:
            meta_tree = ckptr.metadata(path).item_metadata.tree
        except Exception:
            meta_tree = None
        if meta_tree is not None:
            # Normalize paths to name tuples: the metadata tree spells
            # container nodes as plain dicts while the target uses
            # dataclasses/namedtuples, so only the path NAMES line up.
            def _shapes_by_path(tree):
                out = {}
                for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                    names = tuple(
                        str(
                            getattr(p, "key", None)
                            if getattr(p, "key", None) is not None
                            else getattr(p, "name", None)
                            if getattr(p, "name", None) is not None
                            else getattr(p, "idx", p)
                        )
                        for p in path
                    )
                    out[names] = tuple(getattr(leaf, "shape", ()) or ())
                return out

            tgt_shapes = _shapes_by_path(target)
            meta_shapes = _shapes_by_path(meta_tree)
            mismatches = [
                f"{'/'.join(p)}: checkpoint {meta_shapes[p]} vs this "
                f"build {tgt_shapes[p]}"
                for p in sorted(set(tgt_shapes) & set(meta_shapes))
                if tgt_shapes[p] != meta_shapes[p]
            ]
            if mismatches:
                raise ValueError(
                    f"checkpoint at {path} does not match this build's "
                    "array layout: "
                    + "; ".join(mismatches[:8])
                    + (
                        f" (+{len(mismatches) - 8} more)"
                        if len(mismatches) > 8
                        else ""
                    )
                    + ". Likely saved by an older build (e.g. an SCS "
                    "replay buffer packed before SCSState gained the 'vp' "
                    "field). Re-train, or restore without the stale leaves."
                )
        # Restore leaves as host numpy (topology-independent), then let the
        # caller's jit/shardings place them; avoids baking the saving
        # topology's shardings into the restore.
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        restored = ckptr.restore(path, item=target, restore_args=restore_args)
        restored = jax.tree.map(jnp.asarray, restored)
    else:
        # Target-less restore: recover the tree structure from checkpoint
        # metadata and read every leaf as host numpy (sharding-agnostic —
        # a raw Orbax restore insists on concrete shardings).
        meta_tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
        )
        restored = ckptr.restore(path, restore_args=restore_args)
    return restored, int(step)
