"""Loss functions (ref ``Utils/Functions/loss_functions.py`` +
``Training/AlphaZero.py:327,891-939``), vectorized over the batch.

The reference iterates per-sample in Python (``AlphaZero.py:900-910``); here
every loss is a batched reduction.  Per-sample semantics are preserved:

- ``cel``: cross-entropy with soft targets and label smoothing 0.02
  (ref ``nn.CrossEntropyLoss(label_smoothing=0.02)``, ``AlphaZero.py:327``).
- ``kld``: KL(target || log_softmax(pred)) with torch ``KLDivLoss``'s
  default 'mean over elements' reduction (ref ``loss_functions.py:7-11``).
- ``mse_policy``: softmax MSE over actions with non-zero target only
  (ref ``loss_functions.py:13-25``).
- ``se``/``ae``: squared / absolute error (ref ``loss_functions.py:27-33``).

``normalize_policy`` divides the policy loss by log(num_actions) — the
documented intent ("target size is always equal to the total number of
actions", config docs) — where the reference's code divides by
log(batch_size) by mistake (``AlphaZero.py:912-915``); deliberate fix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LABEL_SMOOTHING = 0.02


def cel(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Cross-entropy with label smoothing; [B, A] -> [B]."""
    num_actions = logits.shape[-1]
    smoothed = target * (1.0 - LABEL_SMOOTHING) + LABEL_SMOOTHING / num_actions
    return -(smoothed * jax.nn.log_softmax(logits, axis=-1)).sum(axis=-1)


def kld(logits: jax.Array, target: jax.Array) -> jax.Array:
    """KL divergence; target in prob space.  [B, A] -> [B].

    Matches torch KLDivLoss default reduction (elementwise mean): sum over
    actions divided by num_actions.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    elt = jnp.where(target > 0, target * (jnp.log(jnp.maximum(target, 1e-30)) - logp), 0.0)
    return elt.sum(axis=-1) / logits.shape[-1]


def mse_policy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Softmax MSE counting only non-zero-target actions; [B, A] -> [B]."""
    p = jax.nn.softmax(logits, axis=-1)
    nz = target != 0
    per = jnp.where(nz, (target - p) ** 2, 0.0).sum(axis=-1)
    return per / jnp.maximum(nz.sum(axis=-1), 1)


def se(pred: jax.Array, target: jax.Array) -> jax.Array:
    return (target - pred) ** 2


def ae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(target - pred)


POLICY_LOSSES = {"CEL": cel, "KLD": kld, "MSE": mse_policy}
VALUE_LOSSES = {"SE": se, "AE": ae}


def combined_loss(
    policy_logits: jax.Array,
    value_pred: jax.Array,
    policy_target: jax.Array,
    value_target: jax.Array,
    *,
    policy_loss: str = "CEL",
    value_loss: str = "SE",
    normalize_policy: bool = False,
):
    """Batch-mean (value, policy, combined) losses
    (ref ``AlphaZero.py:891-921``)."""
    p = POLICY_LOSSES[policy_loss](policy_logits, policy_target).mean()
    v = VALUE_LOSSES[value_loss](value_pred, value_target).mean()
    if normalize_policy:
        p = p / jnp.log(jnp.float32(policy_logits.shape[-1]))
    return v, p, p + v
