"""Per-branch BN statistics (separate_stats): public eval stays healthy.

With the reference's shared BN, diverging branch statistics collapse the
PUBLIC branch at eval (running stats fit neither branch). separate_stats
gives each branch its own running statistics and fixes eval.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.data import DataLoader, synthetic_dataset
from deepipr_tpu.models import AlexNet
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.train.steps import make_eval_step, run_eval
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _run(separate, epochs=6):
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    if separate:
        for k in ("4", "5", "6"):
            kw[k]["separate_stats"] = True
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    tx, ty, vx, vy = synthetic_dataset(num_train=1024, num_test=256, size=32)
    train_dl = DataLoader(tx, ty, 64, shuffle=True, drop_last=True)
    valid_dl = DataLoader(vx, vy, 64)
    v = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
    state = TrainState.create(v, sgd_optimizer(0.01))
    step = make_train_step(model, private=True)
    for _ in range(epochs):
        for batch in train_dl:
            state, m = step(state, {k: jnp.asarray(x) for k, x in batch.items()})
    pub = run_eval(make_eval_step(model, ind=0), state, valid_dl)
    priv = run_eval(make_eval_step(model, ind=1), state, valid_dl)
    return v, m, pub, priv


def test_separate_stats_variables_exist():
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    kw["4"]["separate_stats"] = True
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    v = model.init(RNGS, jnp.zeros((1, 16, 16, 3)), train=True)
    assert "bn_private" in v["batch_stats"]["features_4"]
    assert "bn_private" not in v["batch_stats"]["features_5"]  # shared default


def test_public_branch_eval_healthy_with_separate_stats():
    _, m, pub, priv = _run(separate=True)
    assert float(m["sign_acc"]) == 1.0
    assert pub["acc"] > 80.0, pub
    assert priv["acc"] > 80.0, priv
