"""Array-based search tree (no Python node objects).

The reference's tree is a pointer structure of per-node Python ``Node``
objects traversed one simulation at a time with batch-1 NN inference
(ref ``Search/Node.py:3-12``, ``Search/Explorer.py:49-58``).  The TPU-native
tree is a struct-of-arrays pytree with a fixed node budget per game:

- node stats are ``[num_nodes]`` vectors (visit counts, value sums, ...),
- edges are ``[num_nodes, num_actions]`` tables (priors, child indices),
- each node stores the *environment state* it corresponds to (leading-dim
  ``num_nodes`` pytree), so simulations never re-step from the root the way
  the reference's ``shallow_clone`` loop does (ref ``Explorer.py:51-58`` —
  the single most expensive part of the reference's hot loop).

A batch of B independent games is just this structure vmapped to leading
dim B; every simulation's leaf evaluations across the whole batch fuse into
one MXU-sized network call.
"""

from __future__ import annotations

from typing import Any

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
    # Env state per node: pytree with leading dim N.
    states: Any
    # Scalars.
    next_free: jax.Array  # i32 next unallocated slot


def init_tree(env, num_nodes: int, root_state) -> Tree:
    """Fresh single-game tree with the root state written to slot 0."""
    A = env.num_actions

    def tile_slot0(x):
        out = jnp.zeros((num_nodes,) + x.shape, x.dtype)
        return out.at[0].set(x)

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
        states=jax.tree.map(tile_slot0, root_state),
        next_free=jnp.int32(1),
    )


def node_state(tree: Tree, idx: jax.Array):
    """Env state stored at node ``idx`` (single-game tree)."""
    return jax.tree.map(lambda x: x[idx], tree.states)


def write_state(tree_states, idx: jax.Array, state):
    return jax.tree.map(lambda buf, s: buf.at[idx].set(s), tree_states, state)
