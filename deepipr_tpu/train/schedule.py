"""LR schedules and the SGD optimizer matching the reference recipes.

Reference: SGD(momentum=0.9, weight_decay=1e-4) with MultiStepLR stepped per
epoch (experiments/classification.py:47-57). Weight decay is applied to ALL
parameters (torch semantics: decay added to the gradient before the momentum
buffer), which optax reproduces with add_decayed_weights -> trace -> scale.
"""

from __future__ import annotations

from typing import Dict

import optax


def multistep_lr(
    base_lr: float,
    lr_config: Dict,
    steps_per_epoch: int,
):
    """MultiStepLR: lr *= gamma at each epoch boundary; constant if no steps."""
    sched_type = lr_config.get("type", "steps")
    if sched_type != "steps":
        raise ValueError(
            f"unsupported lr schedule type {sched_type!r}: the reference "
            "lr_configs only define type='steps' (MultiStepLR)"
        )
    steps = lr_config.get("steps", [])
    if not steps:
        return base_lr
    boundaries = {int(e) * steps_per_epoch: lr_config["gamma"] for e in steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def sgd_optimizer(
    learning_rate,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """torch.optim.SGD equivalent (no dampening, no nesterov)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
