"""Attack 3 — ambiguity attack: optimize fake passports
(reference passport_attack_3.py).

The attacker freezes all model weights, replaces the passports with trainable
copies (original + 0.001 noise), optionally flips a fraction of the signature
bits, and trains ONLY the fake passports with

    CE + sign loss + 2 * sum(1 / MSE(orig, fake))

(the "maximize distance" term), clipping the fake-passport gradient to global
norm 2 (passport_attack_3.py:60-74). In JAX the fake passports are simply the
differentiated argument — no parameter re-registration needed.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepipr_tpu.passport.sign_loss import total_sign_loss
from deepipr_tpu.train.steps import (
    collect_aux,
    cross_entropy_mean,
    top1_accuracy,
)


def flip_signature_bits(signature: Dict, perc: float, seed: int) -> Dict:
    """Flip `perc` of each layer's signature bits (chosen per layer without
    replacement, passport_attack_3.py:245-263)."""
    if perc == 0:
        return signature
    flat = jax.tree.leaves(signature)
    rng = np.random.default_rng(seed)

    def flip(b):
        b = np.asarray(b).copy()
        k = int(b.size * perc)
        idx = rng.choice(b.size, k, replace=False)
        b[idx] *= -1
        return jnp.asarray(b)

    return jax.tree.map(flip, signature)


def passport_distances(orig: Dict, fake: Dict) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(sum 1/MSE, sum MSE, sum cosine) over all passport leaves."""
    o_leaves = jax.tree.leaves(orig)
    f_leaves = jax.tree.leaves(fake)
    maximize = mse_total = cs_total = jnp.float32(0.0)
    for o, f in zip(o_leaves, f_leaves):
        mse = jnp.mean((o - f) ** 2)
        mse_total += mse
        maximize += 1.0 / (mse + 1e-12)
        of, ff = o.reshape(1, -1), f.reshape(1, -1)
        cs = jnp.sum(of * ff) / (
            jnp.linalg.norm(of) * jnp.linalg.norm(ff) + 1e-12
        )
        cs_total += cs
    return maximize, mse_total, cs_total


def make_ambiguity_step(model, base_vars: Dict, private: bool,
                        tx: optax.GradientTransformation, jit: bool = True):
    """Build the jitted attack step optimizing only the fake passports.

    jit=False returns the raw step for callers that wrap it in their own
    transform (the scanned-epoch path below), mirroring make_train_step."""
    kwargs = {"ind": 1} if private else {}

    def loss_fn(fake_pp, orig_pp, batch):
        v = {**base_vars, "passport": fake_pp}
        logits, upd = model.apply(
            v, batch["image"], train=False,
            mutable=["passport_aux", "batch_stats"], **kwargs,
        )
        ce = cross_entropy_mean(logits, batch["label"])
        sl, sacc = total_sign_loss(collect_aux(upd))
        maximize, mse_total, cs_total = passport_distances(orig_pp, fake_pp)
        loss = ce + sl + 2.0 * maximize
        metrics = {
            "loss": ce, "signloss": sl, "signacc": sacc,
            "maximizeloss": maximize, "mseloss": mse_total,
            "csloss": cs_total, "acc": top1_accuracy(logits, batch["label"]),
        }
        return loss, metrics

    def step(fake_pp, opt_state, orig_pp, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            fake_pp, orig_pp, batch
        )
        updates, opt_state = tx.update(grads, opt_state, fake_pp)
        fake_pp = optax.apply_updates(fake_pp, updates)
        return fake_pp, opt_state, metrics

    if not jit:
        return step
    return jax.jit(step)


def ambiguity_attack(
    model,
    state,
    train_data,
    valid_data,
    epochs: int,
    private: bool,
    flipperc: float = 0.0,
    lr: float = 0.01,
    seed: int = 0,
    noise_std: float = 0.001,
    eval_fn=None,
    scan_epochs: bool = False,
) -> Tuple[Dict, List[Dict]]:
    """Run the full ambiguity attack; returns (fake_passports, history).

    scan_epochs=True runs each attack epoch as ONE lax.scan dispatch over
    the loader's resident images (the train/epoch.py pattern: on-device
    shuffle + gather + fused augmentation keyed by the step counter) — the
    reference recipe's 100 attack epochs stop paying per-step H2D/dispatch.
    Same optimization semantics; only the augmentation rng stream differs
    from the host loader's."""
    orig_pp = jax.device_get(state.passport)
    rng = jax.random.key(seed)
    leaves, treedef = jax.tree.flatten(orig_pp)
    rngs = jax.random.split(rng, len(leaves))
    fake_pp = jax.tree.unflatten(
        treedef,
        [
            jnp.asarray(l) + noise_std * jax.random.normal(r, jnp.shape(l))
            for l, r in zip(leaves, rngs)
        ],
    )

    signature = flip_signature_bits(
        jax.device_get(state.signature), flipperc, seed + 1
    )
    base_vars = {**state.model_variables(), "signature": signature}

    # torch: clip_grad_norm_(fake, 2) then SGD(momentum .9, wd 5e-4)
    tx = optax.chain(
        optax.clip_by_global_norm(2.0),
        optax.add_decayed_weights(5e-4),
        optax.trace(decay=0.9),
        optax.scale_by_learning_rate(lr),
    )
    opt_state = tx.init(fake_pp)
    step = make_ambiguity_step(model, base_vars, private, tx)

    epoch_fn = None
    if scan_epochs and getattr(train_data, "images", None) is not None:
        from deepipr_tpu.data.device_augment import make_device_augment
        from deepipr_tpu.train.epoch import epoch_permutation

        size = train_data.images.shape[1]
        aug = make_device_augment(int((4 / 32) * size),
                                  random_crop=train_data.random_crop)
        bs = train_data.batch_size
        xs = jax.device_put(jnp.asarray(train_data.images))
        ys = jax.device_put(jnp.asarray(train_data.labels))
        raw_step = make_ambiguity_step(model, base_vars, private, tx,
                                       jit=False)

        @jax.jit
        def epoch_fn(fake_pp, opt_state, orig_pp, epoch_key):
            steps, perm = epoch_permutation(epoch_key, xs.shape[0], bs)

            def body(carry, args):
                pp, opt = carry
                t, idx = args
                batch = {
                    "image": aug(jax.random.fold_in(epoch_key, t), xs[idx]),
                    "label": ys[idx],
                }
                pp, opt, metrics = raw_step(pp, opt, orig_pp, batch)
                return (pp, opt), metrics

            (fake_pp, opt_state), ms = jax.lax.scan(
                body, (fake_pp, opt_state), (jnp.arange(steps), perm))
            return fake_pp, opt_state, jax.tree.map(lambda a: a.mean(), ms)

    history: List[Dict] = []
    for ep in range(1, epochs + 1):
        if epoch_fn is not None:
            fake_pp, opt_state, metrics = epoch_fn(
                fake_pp, opt_state, orig_pp,
                jax.random.fold_in(jax.random.key(seed + 50), ep))
            sums = {k: float(v) for k, v in metrics.items()}
            nb = 1
        else:
            sums: Dict[str, float] = {}
            nb = 0
            for batch in train_data:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                fake_pp, opt_state, metrics = step(
                    fake_pp, opt_state, orig_pp, batch)
                nb += 1
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
        row = {f"train_{k}": v / nb for k, v in sums.items()}
        row["epoch"] = ep
        row["flipperc"] = flipperc
        _, mse_total, cs_total = passport_distances(orig_pp, fake_pp)
        nleaves = len(jax.tree.leaves(orig_pp))
        row["cosine_similarity"] = float(cs_total) / max(nleaves, 1)
        row["mse"] = float(mse_total) / max(nleaves, 1)
        if eval_fn is not None:
            row.update(eval_fn(fake_pp))
        history.append(row)
    return jax.device_get(fake_pp), history
