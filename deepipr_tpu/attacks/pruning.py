"""Pruning attack: global magnitude pruning sweep
(reference pruning_attack.py).

For p in {0,10,...,100}%: zero all parameters whose |value| falls below the
global p-th percentile (across EVERY parameter tensor, including biases and
norm affines — pruning_attack.py:54-66), then report per-layer signature
detection (sign of the passport-DERIVED scale vs b) and validation accuracy.

TPU-native: the threshold and masking are a single jitted tree-map; the whole
sweep reuses one compiled eval step.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.attacks.common import derived_affines, detect_signature_from_affines
from deepipr_tpu.train.steps import make_eval_step, run_eval


def global_prune(params: Dict, perc: float) -> Dict:
    """Zero the smallest-|value| perc% of ALL parameters (global threshold)."""
    if perc == 0:
        return params
    flat = jnp.concatenate(
        [jnp.abs(leaf.reshape(-1)) for leaf in jax.tree.leaves(params)]
    )
    threshold = jnp.percentile(flat, perc)
    return jax.tree.map(
        lambda p: p * (jnp.abs(p) > threshold).astype(p.dtype), params
    )


def pruning_attack(
    model,
    state,
    valid_data,
    input_shape,
    private: bool,
    percents=(0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100),
    wm_data=None,
) -> List[Dict]:
    """Sweep pruning levels; one history row per level.

    wm_data (V3): trigger-set loader — each row also records black-box WM
    accuracy (wm_acc = public/deployed forward; wm_acc_private for private
    models), the reference's trigger-set verification surface
    (experiments/trainer.py:115-126) under this attack."""
    # Reference evaluates the DEFAULT forward (pruning_attack.py:80: model(d)):
    # V1 always derives from passports; private models use the public branch.
    eval_step = make_eval_step(model, ind=0, force_passport=False)
    wm_priv_step = (make_eval_step(model, ind=1)
                    if wm_data is not None and private else None)
    prune_fn = jax.jit(global_prune, static_argnums=1)

    history = []
    for perc in percents:
        pruned = prune_fn(state.params, float(perc)) if perc else state.params
        pstate = state.replace(params=pruned)
        affines = derived_affines(
            model, pstate.model_variables(), input_shape, private
        )
        row: Dict = {f"detect_{k}": v
                     for k, v in detect_signature_from_affines(affines).items()}
        row["detect_mean"] = float(np.mean(list(
            detect_signature_from_affines(affines).values()))) if affines else 1.0
        row.update(run_eval(eval_step, pstate, valid_data))
        if wm_data is not None:
            row["wm_acc"] = run_eval(eval_step, pstate, wm_data)["acc"]
            if wm_priv_step is not None:
                row["wm_acc_private"] = run_eval(
                    wm_priv_step, pstate, wm_data)["acc"]
        row["perc"] = perc
        history.append(row)
    return history
