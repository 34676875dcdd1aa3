"""Attack 2 — reverse-engineer scale/bias (reference passport_attack_2.py).

The attacker builds a NORMAL model from a trained passport checkpoint: conv
weights copied, each passport layer's derived scale/bias materialized into the
norm affine. All weights are frozen EXCEPT those norm affines; a fraction of
the scale signs is flipped (values replaced by +-1 signs — the reference's
quirk at passport_attack_2.py:273-281 — and the biases zeroed), then only the
affines are retrained to recover accuracy.

TPU-native: the trainable subset is expressed with optax.masked over the param
tree — no requires_grad mutation.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepipr_tpu.attacks.common import derived_affines, global_sign_flip
from deepipr_tpu.interop.surgery import passport_to_normal
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import (
    cross_entropy_mean,
    make_eval_step,
    run_eval,
    top1_accuracy,
)
from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths


def build_attacked_normal_state(
    passport_model,
    passport_state,
    normal_model,
    input_shape,
    private: bool,
    plpaths: List[str],
    flipperc: float,
    lr: float = 0.01,
    seed: int = 0,
):
    """Construct the attacker's normal model state + masked optimizer."""
    rngs = {"params": jax.random.key(seed)}
    nvars = normal_model.init(rngs, jnp.zeros(input_shape, jnp.float32),
                              train=True)
    affines = derived_affines(
        passport_model, passport_state.model_variables(), input_shape, private
    )
    params, stats = passport_to_normal(
        passport_state.params, passport_state.batch_stats, affines,
        nvars["params"], nvars.get("batch_stats", {}), plpaths,
    )

    # zero biases + flip perc of scale signs (values become +-1)
    flat = dict(flatten_paths(params))
    scales = [np.asarray(flat[f"{p}/bn/scale"]).copy() for p in plpaths]
    flipped, similarity = global_sign_flip(
        scales, flipperc, seed=seed + 1, to_unit_signs=True
    )
    for p, w in zip(plpaths, flipped):
        flat[f"{p}/bn/scale"] = jnp.asarray(w)
        flat[f"{p}/bn/bias"] = jnp.zeros_like(flat[f"{p}/bn/bias"])
    params = unflatten_paths(flat)

    # only the passport layers' bn affines are trainable; everything else is
    # hard-frozen (NOTE: optax.masked would pass raw gradients through for
    # unmasked leaves — multi_transform + set_to_zero actually freezes them)
    trainable_paths = {f"{p}/bn/scale" for p in plpaths} | {
        f"{p}/bn/bias" for p in plpaths
    }
    labels = unflatten_paths({
        k: "train" if k in trainable_paths else "freeze"
        for k in flatten_paths(params)
    })
    tx = optax.multi_transform(
        {
            "train": optax.chain(
                optax.add_decayed_weights(5e-4),
                optax.trace(decay=0.9),
                optax.scale_by_learning_rate(lr),
            ),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    # Deep-copy: shares buffers with the passport state, and the attack train
    # step donates its input (see transfer.py for the same hazard).
    variables = jax.tree.map(lambda x: jnp.array(x, copy=True), variables)
    state = TrainState.create(variables, tx)
    return state, similarity


def make_affine_train_step(model):
    """Plain CE train step on the normal model (only masked params move)."""

    def step(state: TrainState, batch):
        def loss_fn(params):
            variables = {**state.model_variables(), "params": params}
            logits, upd = model.apply(
                variables, batch["image"], train=True, mutable=["batch_stats"]
            )
            ce = cross_entropy_mean(logits, batch["label"])
            return ce, (upd.get("batch_stats", state.batch_stats),
                        {"loss": ce, "acc": top1_accuracy(logits, batch["label"])})

        (_, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return state.apply_gradients(grads).replace(batch_stats=stats), metrics

    return jax.jit(step, donate_argnums=0)


def reverse_attack(
    passport_model,
    passport_state,
    normal_model,
    train_data,
    valid_data,
    input_shape,
    private: bool,
    plpaths: List[str],
    flipperc: float = 0.0,
    epochs: int = 100,
    lr: float = 0.01,
    seed: int = 0,
    wm_data=None,
) -> List[Dict]:
    """Full attack-2 loop; one history row per epoch (+ epoch-0 baseline).

    wm_data (V3): per-epoch black-box WM accuracy of the attacked model —
    does the backdoor survive affine-only retraining?"""
    state, similarity = build_attacked_normal_state(
        passport_model, passport_state, normal_model, input_shape,
        private, plpaths, flipperc, lr, seed,
    )
    eval_step = make_eval_step(normal_model)
    step = make_affine_train_step(normal_model)

    history: List[Dict] = []
    val = run_eval(eval_step, state, valid_data)
    row0 = {"epoch": 0, "similarity": similarity,
            **{f"valid_{k}": v for k, v in val.items()}}
    if wm_data is not None:
        row0["wm_acc"] = run_eval(eval_step, state, wm_data)["acc"]
    history.append(row0)

    for ep in range(1, epochs + 1):
        sums: Dict[str, float] = {}
        nb = 0
        for batch in train_data:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch)
            nb += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        row = {f"train_{k}": v / nb for k, v in sums.items()}
        val = run_eval(eval_step, state, valid_data)
        row.update({f"valid_{k}": v for k, v in val.items()})
        if wm_data is not None:
            row["wm_acc"] = run_eval(eval_step, state, wm_data)["acc"]
        row["epoch"] = ep
        history.append(row)
    return history
