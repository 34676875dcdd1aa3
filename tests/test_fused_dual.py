"""Fused dual-forward V2 step == the two-apply reference formulation.

One stacked 2N apply with per-half BN statistics must reproduce the
sequential public+private training step: same losses, same parameter
updates, same running stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.models import AlexNet, ResNet18Private
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _model(arch="alexnet"):
    if arch == "alexnet":
        cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        return AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    cfg = load_passport_config("passport_configs/resnet18_passport.json")
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    return ResNet18Private(num_classes=10, passport_kwargs=kw)


@pytest.mark.parametrize("arch", ["alexnet", "resnet"])
def test_fused_dual_matches_sequential(arch):
    model = _model(arch)
    x = jax.random.normal(jax.random.key(2), (8, 32, 32, 3))
    y = jax.random.randint(jax.random.key(3), (8,), 0, 10)
    batch = {"image": x, "label": y}

    v = model.init(RNGS, x, train=True)
    s_seq = TrainState.create(v, sgd_optimizer(0.01))
    s_fused = TrainState.create(jax.tree.map(jnp.copy, dict(v)),
                                sgd_optimizer(0.01))

    seq = make_train_step(model, private=True)
    fused = make_train_step(model, private=True, fused_dual=True)

    for i in range(3):
        s_seq, m_seq = seq(s_seq, batch)
        s_fused, m_fused = fused(s_fused, batch)
        for k in ("loss", "sign_loss", "acc_public", "acc_private"):
            assert float(m_seq[k]) == pytest.approx(
                float(m_fused[k]), rel=1e-4, abs=1e-4
            ), (i, k)

    # params + running stats agree after 3 steps
    # fp reassociation differs between the two program shapes (more so with
    # the 8-virtual-device CPU partitioning); 1e-3/1e-4 still catches any
    # semantic divergence (wrong stats halving shows up at 1e-1 scale)
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_seq.batch_stats),
                    jax.tree.leaves(s_fused.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
