"""End-to-end ownership workflow: embed ASCII signature -> train -> deploy ->
verify (genuine passes, forged fails) -> decode the text back."""

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.data import DataLoader, synthetic_dataset
from deepipr_tpu.models import AlexNet
from deepipr_tpu.serve import Predictor, verify_ownership
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def test_full_ownership_workflow():
    # embed the ASCII string "ok" in layer 6 (16 bits into 256 channels)
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": "ok"}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)

    tx, ty, vx, vy = synthetic_dataset(num_train=512, num_test=128, size=32)
    train_dl = DataLoader(tx, ty, 64, shuffle=True, drop_last=True)
    v = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
    state = TrainState.create(v, sgd_optimizer(0.01))
    step = make_train_step(model, private=True)
    for _ in range(2):
        for batch in train_dl:
            state, m = step(state, {k: jnp.asarray(x) for k, x in batch.items()})
    assert float(m["sign_acc"]) == 1.0

    # deployment: public branch predicts without passports
    pred = Predictor(model, state, ind=0)
    from deepipr_tpu.data.datasets import normalize
    acc = float(np.mean(np.asarray(pred.predict(normalize(vx))) == vy))
    assert acc > 0.9

    # owner verification: signature decodes, including the ASCII text
    res = verify_ownership(model, state, (1, 32, 32, 3), private=True,
                           num_chars=2)
    assert res["verified"], res
    assert res["decoded"]["features_6"] == "ok"

    # forged passports fail verification
    forged = jax.tree.map(
        lambda x: jax.random.normal(jax.random.key(9), x.shape), state.passport
    )
    res_forged = verify_ownership(model, state, (1, 32, 32, 3), private=True,
                                  claimed_passports=forged)
    assert not res_forged["verified"]
    assert res_forged["detection_rate"] < 0.7
