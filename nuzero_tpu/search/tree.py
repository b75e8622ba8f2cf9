"""Array-based search tree (no Python node objects).

The reference's tree is a pointer structure of per-node Python ``Node``
objects traversed one simulation at a time with batch-1 NN inference
(ref ``Search/Node.py:3-12``, ``Search/Explorer.py:49-58``).  The TPU-native
tree is a struct-of-arrays pytree with a fixed node budget per game:

- node stats are ``[num_nodes]`` vectors (visit counts, value sums, ...),
- edges are ``[num_nodes, num_actions]`` tables (priors, child indices).

Each node stores the env state it corresponds to — but PACKED into a flat
``f32[D]`` vector (``utils/packing.py``), so node storage is ``[B, N, D]``
with a large minor dimension and negligible tile padding.  (Storing raw
state pytrees pads small trailing dims 10-60x; re-stepping the env along
the path instead — the reference's ``shallow_clone`` scratch games,
``Explorer.py:51-58`` — was measured dispatch-bound: every descent edge
costs an env.step with its own nested stage loop.  Packed per-node states
make descent pure gathers and run env.step exactly once per simulation.)

A batch of B independent games is this structure vmapped to leading dim B;
every simulation's leaf evaluations across the whole batch fuse into one
MXU-sized network call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

UNVISITED = jnp.int32(-1)


@struct.dataclass
class Tree:
    # Per-node arrays, shape [N] (+ batch dims when vmapped).
    visit: jax.Array  # i32 visit counts
    value_sum: jax.Array  # f32 sum of backed-up values (static convention)
    parent: jax.Array  # i32 parent index, -1 at root
    to_play: jax.Array  # i32 player to move at this node
    is_terminal: jax.Array  # bool
    terminal_value: jax.Array  # f32
    expanded: jax.Array  # bool: children priors computed
    # Per-edge arrays, shape [N, A].
    prior: jax.Array  # f32 masked-renormalized priors
    legal: jax.Array  # bool legal-action mask at each node
    child: jax.Array  # i32 child node index or -1
    # Packed env state per node, f32[N, D] (see utils/packing.py).
    states: jax.Array
    # Scalars.
    next_free: jax.Array  # i32 next unallocated slot


def init_tree(num_actions: int, num_nodes: int, state_dim: int) -> Tree:
    """Fresh single-game tree (root at slot 0, not yet expanded)."""
    A = num_actions
    return Tree(
        visit=jnp.zeros(num_nodes, jnp.int32),
        value_sum=jnp.zeros(num_nodes, jnp.float32),
        parent=jnp.full(num_nodes, UNVISITED, jnp.int32),
        to_play=jnp.zeros(num_nodes, jnp.int32),
        is_terminal=jnp.zeros(num_nodes, bool),
        terminal_value=jnp.zeros(num_nodes, jnp.float32),
        expanded=jnp.zeros(num_nodes, bool),
        prior=jnp.zeros((num_nodes, A), jnp.float32),
        legal=jnp.zeros((num_nodes, A), bool),
        child=jnp.full((num_nodes, A), UNVISITED, jnp.int32),
        states=jnp.zeros((num_nodes, state_dim), jnp.float32),
        next_free=jnp.int32(1),
    )
