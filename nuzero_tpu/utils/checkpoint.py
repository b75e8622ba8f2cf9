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


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"step_{step:08d}")


def save_checkpoint(root: str, step: int, tree: Any) -> str:
    path = _ckpt_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
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
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        # Restore leaves as host numpy (topology-independent), then let the
        # caller's jit/shardings place them; avoids baking the saving
        # topology's shardings into the restore.
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        restored = ckptr.restore(path, item=target, restore_args=restore_args)
        restored = jax.tree.map(jnp.asarray, restored)
    else:
        restored = ckptr.restore(path)
    return restored, int(step)
