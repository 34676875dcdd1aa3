"""Deployment & verification API: the paper's ownership workflow as a library.

- Predictor: jitted batched inference on a trained state. For V2/V3 models the
  public branch (ind=0) is the deployment path — no passports needed at
  inference; the private branch is the owner's verification path.
- verify_ownership: white-box verification — derive scales from the claimed
  passports and compare signs against the signature (per layer + decoded
  ASCII), reproducing TesterPrivate.test_signature (trainer_private.py:37-71)
  plus the README's text-embedding demo (reference README.md:86-106).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.passport.codec import bit_accuracy, decode_string
from deepipr_tpu.train.state import TrainState


class Predictor:
    """Batched jitted inference on a trained model state.

    folded=True (requires input_shape) collapses BN + affines into the conv
    kernels first (interop/fold.py): faster, and the resulting variables
    contain no passports/signatures/BN stats — the deployable artifact.
    """

    def __init__(self, model, state: TrainState, ind: int = 0,
                 force_passport: bool = False, folded: bool = False,
                 input_shape=None):
        self.variables = state.model_variables()
        if folded:
            from deepipr_tpu.interop.fold import fold_for_inference

            model, self.variables = fold_for_inference(
                model, self.variables, input_shape, ind=ind)
            ind, force_passport = 0, False  # folded model has one branch
        self.model = model

        @jax.jit
        def _predict(variables, x):
            return model.apply(
                variables, x, ind=ind, force_passport=force_passport,
                train=False,
            )

        self._predict = _predict

    def logits(self, x) -> jax.Array:
        return self._predict(self.variables, jnp.asarray(x))

    def predict(self, x) -> jax.Array:
        return jnp.argmax(self.logits(x), axis=-1)


def verify_ownership(
    model,
    state: TrainState,
    input_shape,
    private: bool,
    claimed_passports: Optional[Dict] = None,
    num_chars: Optional[int] = None,
) -> Dict:
    """White-box ownership check.

    With claimed_passports=None the state's own passports are used (owner
    verification); an attacker's claim is checked by passing their passports.
    Returns per-layer detection rates, the mean, and optionally the decoded
    ASCII text per layer.
    """
    st = state
    if claimed_passports is not None:
        st = state.replace(passport=claimed_passports)
    affines = derived_affines(model, st.model_variables(), input_shape, private)

    result: Dict = {"layers": {}, "decoded": {}}
    total = 0.0
    for path, aux in affines.items():
        det = float(bit_accuracy(aux["scale"], aux["b"]))
        result["layers"][path] = det
        total += det
        if num_chars:
            result["decoded"][path] = decode_string(aux["scale"], num_chars)
    result["detection_rate"] = total / max(len(affines), 1)
    result["verified"] = result["detection_rate"] == 1.0
    return result
