"""Train state: one pytree holding everything a training step needs.

Unlike the reference (model-weights-only .pth checkpoints, no optimizer state —
experiments/base.py:139-150), the full state is checkpointable so true resume
exists (optimizer momentum, step count, BN stats, passports, signatures).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    """Everything that evolves (or is secret) during training.

    params       : trainable weights
    batch_stats  : BN running stats (may be empty dict for GN/IN/none models)
    passport     : secret key/skey tensors per passport layer (non-trainable)
    signature    : target sign vectors b per passport layer (non-trainable)
    opt_state    : optax state
    step         : global step counter
    """

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    passport: Any
    signature: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def model_variables(self):
        """Assemble the flax variables dict for model.apply."""
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.passport:
            v["passport"] = self.passport
        if self.signature:
            v["signature"] = self.signature
        return v

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            passport=variables.get("passport", {}),
            signature=variables.get("signature", {}),
            opt_state=tx.init(params),
            tx=tx,
        )
