"""Jitted train/eval steps for all schemes, plus signature verification.

Scheme semantics (reference experiments/trainer.py, trainer_private.py):

- scheme 0 (baseline) / 1 (V1 passport): one forward; loss = CE + sum of
  per-passport-layer sign losses (V1 only; a normal model sows no aux).
- scheme 2 (V2) / 3 (V3 backdoor): TWO forwards per batch — public ind=0 with
  learned affine, private ind=1 with passport-derived affine; loss =
  CE(pub) + CE(priv) + sign losses from the private branch; BN running stats
  are updated by both forwards sequentially (trainer_private.py:159-173).
- scheme 3 additionally concatenates a trigger-set batch onto every train
  batch before the step (done by the caller to keep shapes static).

Everything is functional: the sign loss is computed from the 'passport_aux'
collection sown during apply, not from mutated module attributes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax

from deepipr_tpu.ops.norms import BN_MOMENTUM
from deepipr_tpu.passport.codec import bit_accuracy
from deepipr_tpu.passport.sign_loss import total_sign_loss
from deepipr_tpu.train.state import TrainState


def cross_entropy_mean(logits, labels, weight=None):
    """Mean CE; with a per-sample weight vector, the weighted mean.

    Weights exist for SPMD padding only: a V3 step batch is task_batch +
    trigger pair (reference trainer.py:115-126), which is rarely divisible by
    the mesh's batch axis — the data layer pads with weight-0 samples so the
    loss stays the reference's mean over the real samples.
    """
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weight is None:
        return ce.mean()
    return (ce * weight).sum() / jnp.maximum(weight.sum(), 1.0)


def top1_accuracy(logits, labels, weight=None):
    """Percentage top-1 accuracy (reference accuracy(), trainer.py:28-43)."""
    hit = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if weight is None:
        return 100.0 * jnp.mean(hit)
    return 100.0 * (hit * weight).sum() / jnp.maximum(weight.sum(), 1.0)


def collect_aux(updates) -> List[Dict[str, Any]]:
    """Flatten the sown 'passport_aux' collection into a list of aux dicts."""
    tree = updates.get("passport_aux", {})
    return jax.tree.leaves(
        tree, is_leaf=lambda t: isinstance(t, dict) and "scale" in t
    )


def collect_aux_with_paths(updates) -> List[Tuple[str, Dict[str, Any]]]:
    """Like collect_aux but keeps the module path, for per-layer reporting."""
    out = []

    def walk(node, path):
        if isinstance(node, dict) and "scale" in node and "b" in node:
            out.append(("/".join(path), node))
            return
        if isinstance(node, (dict,)):
            for k, v in node.items():
                walk(v, path + [k] if k not in ("aux",) else path)
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, path)

    walk(updates.get("passport_aux", {}), [])
    return out


def make_train_step(model, private: bool, split_branches: bool = True,
                    device_augment=None, remat: str = "none", jit: bool = True,
                    seed: int = 0):
    """Build the jitted SGD train step for this model/scheme.

    jit=False returns the raw step function — for callers that wrap it in
    their own transform (the vmapped ensemble step, train/ensemble.py).

    Returns step(state, batch) -> (new_state, metrics); batch is a dict with
    'image' (N,H,W,C) and 'label' (N,). For V3 the trigger batch is already
    concatenated by the data layer.

    split_branches (private models): the public/private forwards are
    identical up to the first passport block, so the shared prefix is
    computed ONCE and the private branch forks from a sown tap
    (models/branching.py). The reference's two full forwards
    (trainer_private.py:159-166) update prefix BN running stats twice with
    the same batch statistics; the split step reproduces that exactly by
    re-applying the EMA step for prefix units:
        r1 = m*r0 + (1-m)*s  (prefix ran once)
        r2 = m*r1 + (1-m)*s = r1 + m*(r1 - r0)
    Gradients are unchanged: CE0(f(x)) + CE1(g(f(x))) differentiates the
    prefix f once through both terms either way.

    seed: experiment seed folded into the per-step device-augment and
    dropout RNG streams so different --seed runs draw different
    augmentation/dropout randomness. seed=0 (the default) reproduces the
    historical streams exactly (key(1)/key(0) folded with the step counter
    only), so existing trajectories/checkpoints are unchanged.
    """
    # base keys for the two per-step RNG streams; domain-separated by the
    # historical 1/0 roots, seed folded in only when non-default
    aug_root = jax.random.key(1)
    drop_root = jax.random.key(0)
    if seed:
        aug_root = jax.random.fold_in(aug_root, seed)
        drop_root = jax.random.fold_in(drop_root, seed)

    fork = None
    if private and split_branches:
        from deepipr_tpu.models.branching import branch_point

        fork = branch_point(model)

    if remat not in ("none", "full"):
        raise ValueError(f"remat must be 'none' or 'full', got {remat!r}")

    def _maybe_remat(f):
        # remat='full': store no forward activations; the backward pass
        # recomputes them. The step is HBM-bandwidth-bound (docs/DESIGN.md
        # §11) while the MXU sits half idle, so trading recompute FLOPs for
        # activation traffic can pay — measured by benchmarks/bench_remat.py.
        if remat == "full":
            return jax.checkpoint(
                f, policy=jax.checkpoint_policies.nothing_saveable)
        return f

    def step(state: TrainState, batch):
        x, y = batch["image"], batch["label"]
        w = batch.get("weight")  # per-sample weights (SPMD padding), or None
        if device_augment is not None:
            # raw uint8 batch from the host; crop/flip/normalize fused into
            # this step on-device (data/device_augment.py), deterministic in
            # the step counter
            x = device_augment(jax.random.fold_in(aug_root, state.step), x)
            if "wm_image" in batch:
                # V3: trigger batch rides as raw uint8 and concatenates here
                # on-device — normalize only, never random-augmented (the
                # reference's trigger transform is CenterCrop+Normalize,
                # dataset.py:177-186)
                from deepipr_tpu.data.device_augment import normalize_device

                x = jnp.concatenate([x, normalize_device(batch["wm_image"], x.dtype)])
                y = jnp.concatenate([y, batch["wm_label"]])
        # deterministic per-step dropout rng (only consumed by models that
        # have dropout, i.e. the ImageNet AlexNet classifier)
        rngs = {"dropout": jax.random.fold_in(drop_root, state.step)}

        def loss_fn(params):
            variables = {**state.model_variables(), "params": params}

            if private and fork is not None:
                fork_name, prefix_units = fork

                @_maybe_remat
                def fwd0(variables, x):
                    return model.apply(
                        variables, x, ind=0, train=True, rngs=rngs,
                        mutable=["batch_stats", "passport_aux", "branch_tap"],
                        tap_at=fork_name,
                    )

                @_maybe_remat
                def fwd1(variables, tap):
                    return model.apply(
                        variables, tap, ind=1, train=True, rngs=rngs,
                        mutable=["batch_stats", "passport_aux"],
                        start_at=fork_name,
                    )

                logits0, upd0 = fwd0(variables, x)
                tap = jax.tree.leaves(upd0["branch_tap"])[0]
                if "batch_stats" in upd0:
                    variables = {**variables, "batch_stats": upd0["batch_stats"]}
                logits1, upd1 = fwd1(variables, tap)
                ce = cross_entropy_mean(logits0, y, w) + cross_entropy_mean(
                    logits1, y, w)
                sl, sacc = total_sign_loss(collect_aux(upd1))
                new_stats = upd1.get("batch_stats", state.batch_stats)
                if new_stats:
                    new_stats = dict(new_stats)
                    for unit in prefix_units:
                        if unit in new_stats:
                            new_stats[unit] = jax.tree.map(
                                lambda r1, r0: r1 + BN_MOMENTUM * (r1 - r0),
                                new_stats[unit], state.batch_stats[unit],
                            )
                metrics = {
                    "acc_public": top1_accuracy(logits0, y, w),
                    "acc_private": top1_accuracy(logits1, y, w),
                }
            elif private:

                def fwd_ind(ind):
                    @_maybe_remat
                    def f(variables, x):
                        return model.apply(
                            variables, x, ind=ind, train=True, rngs=rngs,
                            mutable=["batch_stats", "passport_aux"],
                        )
                    return f

                logits0, upd0 = fwd_ind(0)(variables, x)
                if "batch_stats" in upd0:
                    variables = {**variables, "batch_stats": upd0["batch_stats"]}
                logits1, upd1 = fwd_ind(1)(variables, x)
                ce = cross_entropy_mean(logits0, y, w) + cross_entropy_mean(
                    logits1, y, w)
                sl, sacc = total_sign_loss(collect_aux(upd1))
                new_stats = upd1.get("batch_stats", state.batch_stats)
                metrics = {
                    "acc_public": top1_accuracy(logits0, y, w),
                    "acc_private": top1_accuracy(logits1, y, w),
                }
            else:

                @_maybe_remat
                def fwd(variables, x):
                    return model.apply(
                        variables, x, train=True, rngs=rngs,
                        mutable=["batch_stats", "passport_aux"],
                    )

                logits, upd = fwd(variables, x)
                ce = cross_entropy_mean(logits, y, w)
                sl, sacc = total_sign_loss(collect_aux(upd))
                new_stats = upd.get("batch_stats", state.batch_stats)
                metrics = {"acc": top1_accuracy(logits, y, w)}

            loss = ce + sl
            metrics.update({"loss": ce, "sign_loss": sl, "sign_acc": sacc})
            return loss, (new_stats, metrics)

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=0)


def make_dual_eval_step(model, split_branches: bool = True):
    """Both-branch eval in ONE data pass (reference TesterPrivate.test,
    trainer_private.py:218-251, runs the loader twice).

    Like the split train step, the shared prefix up to the first passport
    block is computed once and the private branch forks from the sown tap —
    at eval the branches are bit-identical up to that block (same params,
    same BN running stats)."""
    fork = None
    if split_branches:
        from deepipr_tpu.models.branching import branch_point

        fork = branch_point(model)

    def step(state: TrainState, batch):
        x, y = batch["image"], batch["label"]
        v = state.model_variables()
        if fork is not None:
            name, _ = fork
            logits0, upd = model.apply(
                v, x, ind=0, train=False, mutable=["branch_tap"], tap_at=name,
            )
            tap = jax.tree.leaves(upd["branch_tap"])[0]
            logits1 = model.apply(v, tap, ind=1, train=False, start_at=name)
        else:
            logits0 = model.apply(v, x, ind=0, train=False)
            logits1 = model.apply(v, x, ind=1, train=False)
        out = {}
        for tag, logits in (("public", logits0), ("private", logits1)):
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            out[f"ce_sum_{tag}"] = ce.sum()
            out[f"correct_{tag}"] = jnp.sum(
                (jnp.argmax(logits, axis=-1) == y).astype(jnp.int32))
        return out

    return jax.jit(step)


def run_dual_eval(step, state, dataset):
    """Drive a dual eval step -> the TesterPrivate metric dict."""
    sums, count = None, 0
    for batch in dataset:
        out = step(state, batch)
        sums = out if sums is None else jax.tree.map(
            lambda a, b: a + b, sums, out)
        count += batch["label"].shape[0]
    if count == 0:
        return {"loss_public": 0.0, "acc_public": 0.0,
                "loss_private": 0.0, "acc_private": 0.0, "total_acc": 0.0}
    res = {
        "loss_public": float(sums["ce_sum_public"]) / count,
        "acc_public": 100.0 * int(sums["correct_public"]) / count,
        "loss_private": float(sums["ce_sum_private"]) / count,
        "acc_private": 100.0 * int(sums["correct_private"]) / count,
    }
    res["total_acc"] = (res["acc_public"] + res["acc_private"]) / 2
    return res


def make_eval_step(model, ind: int = 0, force_passport: bool = False):
    """Sum-reduced CE + correct-count eval step (reference Tester.test)."""

    def step(state: TrainState, batch):
        x, y = batch["image"], batch["label"]
        logits = model.apply(
            state.model_variables(), x, ind=ind, force_passport=force_passport,
            train=False,
        )
        ce_sum = optax.softmax_cross_entropy_with_integer_labels(logits, y).sum()
        correct = jnp.sum((jnp.argmax(logits, axis=-1) == y).astype(jnp.int32))
        return {"ce_sum": ce_sum, "correct": correct}

    return jax.jit(step)


def make_signature_fn(model, input_shape, private: bool):
    """Build a jitted signature-detection pass; call it with a TrainState.

    Mirrors TesterPrivate.test_signature (trainer_private.py:37-71). The
    derived scale depends only on (conv kernel, skey), so a zeros input of the
    right shape drives the model once with the passport branch forced.
    Returns {layer_path: detection_rate}.
    """
    kwargs = {"ind": 1} if private else {"force_passport": True}
    prefix = "private_" if private else "public_"

    @jax.jit
    def run(state: TrainState):
        x = jnp.zeros(input_shape, jnp.float32)
        _, upd = model.apply(
            state.model_variables(), x, train=False,
            mutable=["passport_aux", "batch_stats"], **kwargs,
        )
        return {
            prefix + path: bit_accuracy(aux["scale"], aux["b"])
            for path, aux in collect_aux_with_paths(upd)
        }

    def fn(state: TrainState):
        return {k: float(v) for k, v in run(state).items()}

    return fn


def test_signature(model, state: TrainState, input_shape, private: bool):
    """One-shot convenience wrapper around make_signature_fn."""
    return make_signature_fn(model, input_shape, private)(state)


def run_eval(step, state, dataset):
    """Drive a prebuilt eval step over a dataset -> {'loss', 'acc'}.

    Accumulates the per-batch sums as device scalars and fetches the result
    once at the end, so batches pipeline (a per-batch float() would force a
    host sync between every dispatch — measurable on a relayed TPU).
    """
    ce_sum, correct, count = None, None, 0
    for batch in dataset:
        out = step(state, batch)
        ce_sum = out["ce_sum"] if ce_sum is None else ce_sum + out["ce_sum"]
        correct = out["correct"] if correct is None else correct + out["correct"]
        count += batch["label"].shape[0]
    if count == 0:
        return {"loss": 0.0, "acc": 0.0}
    return {"loss": float(ce_sum) / count, "acc": 100.0 * int(correct) / count}


def evaluate(model, state, dataset, ind: int = 0, force_passport: bool = False):
    """One-shot full-dataset eval (builds a fresh jitted step; prefer
    make_eval_step + run_eval inside loops)."""
    step = make_eval_step(model, ind=ind, force_passport=force_passport)
    return run_eval(step, state, dataset)
