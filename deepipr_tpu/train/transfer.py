"""Transfer-learning harness: fine-tune a clone and test signature survival.

Reference flow (experiments/classification.py:142-263,
classification_private.py:161-330):

1. Clone the trained model into a NORMAL model sized for the TL dataset
   (passport layers' derived scale/bias -> norm affine).
2. rtal: reset the last classifier layer; ftal: keep it.
3. Fine-tune the clone with SGD (wd 5e-4).
4. Each epoch, copy the fine-tuned weights back into the original passport
   model and measure whether the signature still decodes:
   - V1: sign of the fine-tuned affine scale vs b (the reference materializes
     the affine into learnable scale params and reads them),
   - V2/V3: the passport-derived scale from the fine-tuned conv kernels.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp

from deepipr_tpu.attacks.common import derived_affines, plkey_to_module_path
from deepipr_tpu.interop.surgery import (
    _last_classifier_module,
    copy_matching,
    normal_to_normal,
    passport_to_normal,
)
from deepipr_tpu.models.registry import NUM_CLASSES, build_model
from deepipr_tpu.passport.codec import bit_accuracy
from deepipr_tpu.train.schedule import multistep_lr, sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import make_eval_step, make_train_step, run_eval
from deepipr_tpu.utils.checkpoint import save_state
from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths


def _copied_back_state(exp, tl_state):
    """The original passport model's state with the fine-tuned clone's
    matching weights (and BN stats) copied back in — the reference's
    per-epoch `self.model.load_state_dict(tl_model.state_dict())` surgery
    (classification_private.py:275-305)."""
    new_params = copy_matching(tl_state.params, exp.state.params)
    new_stats = exp.state.batch_stats
    if tl_state.batch_stats and exp.state.batch_stats:
        new_stats = copy_matching(tl_state.batch_stats, exp.state.batch_stats)
    return exp.state.replace(params=new_params, batch_stats=new_stats)


def _signature_survival(exp, tl_params, plpaths) -> Dict[str, float]:
    """Per-layer signature detection after fine-tuning."""
    sig = flatten_paths(jax.device_get(exp.state.signature))
    out = {}
    if exp.private:
        # copy fine-tuned weights back into the passport model, re-derive
        new_params = copy_matching(tl_params, exp.state.params)
        st = exp.state.replace(params=new_params)
        shape = (1, exp.imgcrop, exp.imgcrop, exp.in_channels)
        affines = derived_affines(exp.model, st.model_variables(), shape, True)
        for path, aux in affines.items():
            out[f"private_{path}"] = float(bit_accuracy(aux["scale"], aux["b"]))
    else:
        # V1: the fine-tuned norm affine IS the materialized scale
        flat = flatten_paths(tl_params)
        for path in plpaths:
            b = sig[f"{path}/b"]
            scale = flat[f"{path}/bn/scale"]
            out[f"public_{path}"] = float(bit_accuracy(jnp.asarray(scale), b))
    return out


def transfer_learning(exp) -> List[Dict]:
    """Run the TL loop on an already-constructed ClassificationExperiment."""
    from deepipr_tpu.data.datasets import prepare_dataset

    tl_classes = NUM_CLASSES[exp.tl_dataset]
    is_imagenet = exp.num_classes == 1000
    tl_model = build_model(exp.arch, tl_classes, exp.norm_type,
                           imagenet=is_imagenet)
    rngs = {"params": jax.random.key(exp.seed + 100)}
    sample = jnp.zeros((1, exp.imgcrop, exp.imgcrop, exp.in_channels))
    tl_vars = tl_model.init(rngs, sample, train=True)

    plpaths = [plkey_to_module_path(k) for k in exp.plkeys]
    skip_last = exp.tl_scheme == "rtal" or tl_classes != exp.num_classes
    if exp.scheme == 0:
        params, stats = normal_to_normal(
            exp.state.params, exp.state.batch_stats,
            tl_vars["params"], tl_vars.get("batch_stats", {}),
            skip_last_classifier=skip_last,
        )
    else:
        shape = (1, exp.imgcrop, exp.imgcrop, exp.in_channels)
        affines = derived_affines(
            exp.model, exp.state.model_variables(), shape, exp.private
        )
        params, stats = passport_to_normal(
            exp.state.params, exp.state.batch_stats, affines,
            tl_vars["params"], tl_vars.get("batch_stats", {}), plpaths,
        )
        if skip_last:
            # rtal: keep the fresh random last classifier from tl_vars
            fresh = flatten_paths(tl_vars["params"])
            flat = dict(flatten_paths(params))
            last = _last_classifier_module(fresh)
            for k in fresh:
                if last is not None and k.split("/")[0] == last:
                    flat[k] = fresh[k]
            params = unflatten_paths(flat)

    tl_args = dict(exp.args)
    tl_args["transfer_learning"] = True
    train_data, valid_data = prepare_dataset(tl_args)

    schedule = multistep_lr(exp.lr, exp.lr_config, len(train_data))
    tx = sgd_optimizer(schedule, momentum=0.9, weight_decay=5e-4)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    # Deep-copy: the cloned tree shares buffers with exp.state, and the TL
    # train step donates its input state — without the copy, donation would
    # delete the original model's buffers out from under it.
    variables = jax.tree.map(lambda x: jnp.array(x, copy=True), variables)
    tl_state = TrainState.create(variables, tx)

    train_step = make_train_step(tl_model, private=False)
    eval_step = make_eval_step(tl_model)

    tl_dir = os.path.join(exp.logdir, "tl_1")
    os.makedirs(os.path.join(tl_dir, "models"), exist_ok=True)
    history: List[Dict] = []
    best = float("-inf")

    for ep in range(1, exp.epochs + 1):
        sums: Dict[str, float] = {}
        nb = 0
        for batch in train_data:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            tl_state, metrics = train_step(tl_state, batch)
            nb += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        row = {f"train_{k}": v / nb for k, v in sums.items()}
        val = run_eval(eval_step, tl_state, valid_data)
        row.update({f"valid_{k}": v for k, v in val.items()})
        if exp.scheme != 0:
            row.update({
                f"old_wm_passport_{k}": v
                for k, v in _signature_survival(exp, tl_state.params, plpaths).items()
            })
        if exp.train_backdoor and exp.wm_data is not None:
            # reference 'Old WM Accuracy' (classification_private.py:309 /
            # classification.py:236-238): re-test the trigger set through the
            # ORIGINAL model with the fine-tuned weights copied back in —
            # does the backdoor survive fine-tuning?
            back = exp._dual_eval(
                exp.wm_data, state=_copied_back_state(exp, tl_state))
            row.update({f"backdoor_{k}": v for k, v in back.items()})
        row["epoch"] = ep
        history.append(row)
        print(f"TL epoch {ep:3d} " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(row.items()) if k != "epoch"
        ))

        if row["valid_acc"] > best:
            best = row["valid_acc"]
            save_state(os.path.join(tl_dir, "models", "tl-best.ckpt"), tl_state)
        save_state(os.path.join(tl_dir, "models", "tl-last.ckpt"), tl_state)

    import csv

    with open(os.path.join(tl_dir, "history.csv"), "w", newline="") as f:
        cols = sorted({k for r in history for k in r})
        w = csv.writer(f)
        w.writerow(cols)
        for r in history:
            w.writerow([r.get(c, "") for c in cols])
    return history
