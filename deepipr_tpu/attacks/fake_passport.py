"""Attack 1 — random fake passports (reference passport_attack_1.py).

Repeatedly replace the model's passports with passports derived from random
validation images (through a pretrained model) and measure how inference
accuracy collapses.

TPU-native: instead of R sequential evaluations, the R candidate passport sets
are STACKED and evaluated in one vmapped, jitted sweep per data batch — the
model is applied as a function of the passport collection, so vmap turns R
fake-passport evaluations into one compiled program.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepipr_tpu.passport.codec import bit_accuracy
from deepipr_tpu.train.keys import sample_candidates, setup_passports
from deepipr_tpu.train.steps import collect_aux


def build_fake_passports(
    pretrained_model,
    pretrained_vars,
    passport_template,
    candidates: np.ndarray,
    reps: int,
    seed: int,
    n: int = 20,
) -> List[Dict]:
    """R independent fake passport collections from random candidate images."""
    out = []
    for r in range(reps):
        kx = sample_candidates(candidates, n, seed=seed + 2 * r)
        ky = sample_candidates(candidates, n, seed=seed + 2 * r + 1)
        out.append(
            setup_passports(
                pretrained_model, pretrained_vars, passport_template,
                kx, ky, seed=seed + 10_000 + r,
            )
        )
    return out


def random_passport_attack(
    model,
    state,
    pretrained_model,
    pretrained_vars,
    candidates: np.ndarray,
    data,
    reps: int,
    private: bool,
    seed: int = 0,
) -> List[Dict]:
    """Evaluate the model under R random fake passports in one vmapped sweep.

    Returns one history row per rep: {'attack_rep', 'valid_acc', 'valid_loss',
    'valid_signacc'} plus a leading row for the genuine passports (rep=-1),
    matching the reference's CSV semantics (passport_attack_1.py:277-289).
    """
    fakes = build_fake_passports(
        pretrained_model, pretrained_vars, jax.device_get(state.passport),
        candidates, reps, seed,
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *fakes)
    kwargs = {"ind": 1} if private else {"force_passport": True}

    base_vars = state.model_variables()

    @jax.jit
    def eval_batch(stacked_pp, batch):
        def one(pp):
            v = {**base_vars, "passport": pp}
            logits, upd = model.apply(
                v, batch["image"], train=False,
                mutable=["passport_aux", "batch_stats"], **kwargs,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).sum()
            correct = jnp.sum(
                (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.int32)
            )
            auxes = collect_aux(upd)
            sacc = (
                sum(bit_accuracy(a["scale"], a["b"]) for a in auxes) / len(auxes)
                if auxes else jnp.float32(1.0)
            )
            return ce, correct, sacc

        return jax.vmap(one)(stacked_pp)

    @jax.jit
    def eval_batch_genuine(batch):
        ce, correct, sacc = eval_batch(
            jax.tree.map(lambda x: x[None], state.passport), batch
        )
        return ce[0], correct[0], sacc[0]

    ce = np.zeros(reps)
    correct = np.zeros(reps)
    sacc = np.zeros(reps)
    g_ce = g_correct = g_sacc = 0.0
    count = 0
    nbatches = 0
    for batch in data:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        c, k, s = eval_batch(stacked, batch)
        ce += np.asarray(c)
        correct += np.asarray(k)
        sacc += np.asarray(s)
        gc, gk, gs = eval_batch_genuine(batch)
        g_ce += float(gc)
        g_correct += float(gk)
        g_sacc += float(gs)
        count += batch["label"].shape[0]
        nbatches += 1

    history = [{
        "attack_rep": -1,
        "valid_loss": g_ce / count,
        "valid_acc": 100.0 * g_correct / count,
        "valid_signacc": g_sacc / nbatches,
    }]
    for r in range(reps):
        history.append({
            "attack_rep": r,
            "valid_loss": float(ce[r]) / count,
            "valid_acc": 100.0 * float(correct[r]) / count,
            "valid_signacc": float(sacc[r]) / nbatches,
        })
    return history
