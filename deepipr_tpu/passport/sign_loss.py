"""Sign loss: hinge penalty forcing sign(scale) == b, as a pure function.

Reference semantics (models/losses/sign_loss.py:27,53):

    loss = sum(alpha * relu(0.1 - b * scale)) + 1e-5 * sum(scale ** 2)

The reference accumulates this by mutating module attributes during the forward
pass; here the derived scales flow out of the model as auxiliary outputs and the
loss is computed functionally in the train step.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp

# Matches the reference's hard-coded hinge margin and L2 coefficient.
HINGE_MARGIN = 0.1
SCALE_REG = 1e-5


def sign_loss(scale: jax.Array, b: jax.Array, alpha: float = 1.0) -> jax.Array:
    """Hinge sign loss + small L2 regularizer on the scale vector."""
    scale = scale.reshape(-1)
    b = b.reshape(-1)
    hinge = jnp.sum(alpha * jax.nn.relu(HINGE_MARGIN - b * scale))
    reg = SCALE_REG * jnp.sum(scale * scale)
    return hinge + reg


def sign_accuracy(scale: jax.Array, b: jax.Array) -> jax.Array:
    """mean(sign(b) == sign(scale)) — the reference's SignLoss.get_acc."""
    return jnp.mean(
        (jnp.sign(b.reshape(-1)) == jnp.sign(scale.reshape(-1))).astype(jnp.float32)
    )


def total_sign_loss(aux_entries: Iterable[Dict[str, Any]]) -> Tuple[jax.Array, jax.Array]:
    """Sum sign losses and average bit accuracies over passport-layer aux dicts.

    Each entry holds {'scale': (C,), 'b': (C,), 'alpha': float}, as sown by the
    passport modules. Returns (total_loss, mean_sign_acc). Mirrors the reference's
    per-module accumulation (experiments/trainer.py:131-171).
    """
    entries = list(aux_entries)
    if not entries:
        return jnp.float32(0.0), jnp.float32(1.0)
    losses = [sign_loss(e["scale"], e["b"], e["alpha"]) for e in entries]
    accs = [sign_accuracy(e["scale"], e["b"]) for e in entries]
    return sum(losses), sum(accs) / len(accs)
