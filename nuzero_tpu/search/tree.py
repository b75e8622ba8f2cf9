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

import math

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
    # DENSE per-edge search statistics, duplicated from the child nodes'
    # visit/value_sum.  PUCT selection needs every child's (visit, q) at
    # the current node; reading them through ``child`` indices is a
    # [num_actions]-wide gather that TPUs execute element-serially —
    # profiled at 1.3 ms per call on a [256, 525] index set, 77% of the
    # whole search.  Dense rows make selection a contiguous dynamic-slice
    # and are kept in sync by backprop crediting each descended edge.
    child_visit: jax.Array  # i32[N, A] visit counts of each edge's target
    child_vsum: jax.Array  # f32[N, A] value sums of each edge's target
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
        child_visit=jnp.zeros((num_nodes, A), jnp.int32),
        child_vsum=jnp.zeros((num_nodes, A), jnp.float32),
        states=jnp.zeros((num_nodes, state_dim), jnp.float32),
        next_free=jnp.int32(1),
    )

def _remap_small(table: jax.Array, values: jax.Array) -> jax.Array:
    """``table[values]`` for values in ``[0, len(table))`` with a small,
    static table — as an unrolled select chain instead of a gather.

    TPU lowers per-element gathers over a [N*A]-sized index set to a serial
    custom call: the ``inv[child]`` remap in ``reroot`` profiled at 87 ms
    per move at [B=256, N=64, A=525] — 44% of the whole self-play step.
    N static selects fuse into ONE elementwise pass over ``values``
    (~1 ms for the same shape): each node id is compared against every slot
    and picks that slot's remapped id.  O(N) compares per element beats a
    "O(1)" gather by ~87x because the compares are lane-parallel VPU work
    while gather addressing is serial.
    """
    out = jnp.zeros(values.shape, table.dtype)
    for k in range(table.shape[0]):
        out = jnp.where(values == k, table[k], out)
    return out


def reroot(tree: Tree, action: jax.Array) -> tuple[Tree, jax.Array]:
    """Re-root a single-game tree at the child reached by ``action``.

    Implements the reference's ``keep_subtree`` option — after a move is
    played, the chosen child's subtree is retained so its statistics seed
    the next move's search (ref ``Training/Gamer.py:78-79`` root swap,
    ``Search/Explorer.py`` subtree reuse;
    ``Configs/Search/Examples/documentation_search_config.yaml``).

    The reference swaps a Python pointer.  Here the subtree must be
    *compacted* back into the fixed-budget array tree:

    1. mark every node whose ancestor chain contains the new root — by
       pointer-doubling over parent links (O(log N) gather rounds, no
       sequential walk),
    2. compute a permutation placing the new root at slot 0 and the other
       marked nodes after it (one argsort),
    3. gather every per-node/per-edge array through the permutation,
       remapping ``parent``/``child`` indices and zeroing dead slots so
       later allocations start from a clean node.

    Returns ``(new_tree, ok)``; ``ok`` is False when the chosen action has
    no materialized child (possible under epsilon-random/softmax action
    selection), in which case the caller should start the next search from
    a fresh tree.
    """
    N = tree.visit.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    c = tree.child[0, action]
    ok = c != UNVISITED
    c_safe = jnp.where(ok, c, 0)

    # All node-indexed reads below go through ONE-HOT MATMULS, not gathers.
    # A vmapped per-game gather makes XLA (a) serialize the read and (b)
    # prefer batch-minor layouts for the gathered table — which then forces
    # a full-table layout copy of the [N, A] edge stats on EVERY simulation
    # at the search loop boundary (profiled: 10.7 ms/move at
    # [512, 64, 525] on the 256f leg).  One-hot f32 matmuls at HIGHEST
    # precision are exact (each output sums exactly one 1.0*x product; the
    # bf16x3 f32 decomposition reconstructs x bit-exactly), run on the MXU,
    # and keep every table in its natural row-major layout.
    f32 = jnp.float32
    highest = jax.lax.Precision.HIGHEST

    def oh(indices):  # [M] -> f32[M, N] one-hot rows
        return (indices[:, None] == idx[None, :]).astype(f32)

    # --- 1. subtree membership by pointer doubling.
    mark = idx == c_safe
    ptr = jnp.where(tree.parent >= 0, tree.parent, idx)
    for _ in range(max(1, math.ceil(math.log2(max(N, 2))))):
        ptr_oh = oh(ptr)
        mark = mark | (ptr_oh @ mark.astype(f32) > 0.5)
        ptr = jnp.round(ptr_oh @ ptr.astype(f32)).astype(jnp.int32)

    # --- 2. compaction permutation: new root first, marked nodes next
    # (stable in old-index order), dead nodes last.
    n_live = mark.sum().astype(jnp.int32)
    key = jnp.where(mark, idx, N + idx)
    key = jnp.where(idx == c_safe, -1, key)
    dest = jnp.argsort(key).astype(jnp.int32)  # old index at each new slot
    inv = jnp.zeros(N, jnp.int32).at[dest].set(idx)  # old -> new
    live = idx < n_live
    perm = oh(dest)  # f32[N, N]: out[m] = in[dest[m]]

    def permute(table, out_dtype=None):
        """table[dest] as an MXU matmul (exact — see note above)."""
        flat = table.reshape(N, -1).astype(f32)
        out = jnp.matmul(perm, flat, precision=highest)
        out = out.reshape((N,) + table.shape[1:])
        dt = out_dtype or table.dtype
        if dt == jnp.float32:
            return out
        if dt == jnp.bool_:
            return out > 0.5
        return jnp.round(out).astype(dt)

    # Per-node scalars ride one stacked matmul.
    node_cols = jnp.stack(
        [
            tree.visit.astype(f32),
            tree.value_sum,
            tree.parent.astype(f32),
            tree.to_play.astype(f32),
            tree.is_terminal.astype(f32),
            tree.terminal_value,
            tree.expanded.astype(f32),
        ],
        axis=1,
    )
    node_perm = jnp.matmul(perm, node_cols, precision=highest)

    # --- 3. permute + remap indices + clear dead slots.
    parent_old = jnp.round(node_perm[:, 2]).astype(jnp.int32)
    parent = jnp.where(
        live & (idx != 0),
        _remap_small(inv, jnp.maximum(parent_old, 0)),
        UNVISITED,
    )
    child_old = permute(tree.child)
    child = jnp.where(
        live[:, None] & (child_old >= 0),
        _remap_small(inv, jnp.maximum(child_old, 0)),
        UNVISITED,
    )
    new_tree = Tree(
        visit=jnp.where(
            live, jnp.round(node_perm[:, 0]).astype(jnp.int32), 0
        ),
        value_sum=jnp.where(live, node_perm[:, 1], 0.0),
        parent=parent,
        to_play=jnp.where(
            live, jnp.round(node_perm[:, 3]).astype(jnp.int32), 0
        ),
        is_terminal=jnp.where(live, node_perm[:, 4] > 0.5, False),
        terminal_value=jnp.where(live, node_perm[:, 5], 0.0),
        expanded=jnp.where(live, node_perm[:, 6] > 0.5, False),
        prior=jnp.where(live[:, None], permute(tree.prior), 0.0),
        legal=jnp.where(live[:, None], permute(tree.legal), False),
        child=child,
        child_visit=jnp.where(live[:, None], permute(tree.child_visit), 0),
        child_vsum=jnp.where(live[:, None], permute(tree.child_vsum), 0.0),
        states=jnp.where(live[:, None], permute(tree.states), 0.0),
        next_free=jnp.where(ok, n_live, jnp.int32(1)),
    )
    return new_tree, ok


def print_tree(tree: Tree, game_idx=None, max_children: int = 8,
               file=None) -> str:
    """Host-side debug dump of one game's array tree (ref the reference's
    recursive ``Explorer.print_tree``, ``Search/Explorer.py:216``).

    ``tree`` is a single-game Tree, or a vmapped batch with ``game_idx``
    selecting the game.  Prints a depth-indented listing of the allocated
    nodes: visits, mean value, prior, terminal flag — and returns it.
    """
    import numpy as np

    if game_idx is not None:
        tree = jax.tree.map(lambda x: x[game_idx], tree)
    visit = np.asarray(tree.visit)
    vsum = np.asarray(tree.value_sum)
    child = np.asarray(tree.child)
    prior = np.asarray(tree.prior)
    to_play = np.asarray(tree.to_play)
    term = np.asarray(tree.is_terminal)
    n_alloc = int(tree.next_free)

    lines = [f"tree: {n_alloc} allocated nodes / {visit.shape[0]} capacity"]

    def rec(node, depth, via_action, via_prior):
        q = vsum[node] / max(int(visit[node]), 1)
        tag = " TERMINAL" if term[node] else ""
        via = f"a={via_action} p={via_prior:.3f} -> " if via_action is not None else ""
        lines.append(
            f"{'  ' * depth}{via}node {node}: n={int(visit[node])} "
            f"q={q:+.3f} to_play={int(to_play[node])}{tag}"
        )
        kids = [
            (int(child[node, a]), a)
            for a in np.flatnonzero(child[node] >= 0)
        ]
        kids.sort(key=lambda ka: -int(visit[ka[0]]))
        for c, a in kids[:max_children]:
            rec(c, depth + 1, a, float(prior[node, a]))
        if len(kids) > max_children:
            lines.append(
                f"{'  ' * (depth + 1)}... {len(kids) - max_children} more "
                "children"
            )

    if n_alloc > 0:
        rec(0, 0, None, None)
    out = "\n".join(lines)
    print(out, file=file)
    return out
