"""Norm-type coverage (bn/gn/in/none) and bf16 mixed-precision training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.models import AlexNet, ResNet18
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _passport_alexnet(norm, private=False, dtype=None):
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, norm, "shuffle", 0.1)
    return AlexNet(num_classes=10, norm_type=norm, passport_kwargs=kw,
                   private=private, dtype=dtype)


class TestNormTypes:
    @pytest.mark.parametrize("norm", ["bn", "gn", "in", "none"])
    def test_passport_forward_all_norms(self, norm):
        m = _passport_alexnet(norm, private=True)
        x = jnp.ones((2, 16, 16, 3))
        v = m.init(RNGS, x, train=True)
        if norm == "bn":
            assert "batch_stats" in v
        else:
            assert "batch_stats" not in v
        y0 = m.apply(v, x, ind=0)
        y1 = m.apply(v, x, ind=1)
        assert y0.shape == y1.shape == (2, 10)

    @pytest.mark.parametrize("norm", ["gn", "none"])
    def test_train_step_without_batch_stats(self, norm):
        m = _passport_alexnet(norm, private=True)
        x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3))
        v = m.init(RNGS, x, train=True)
        state = TrainState.create(v, sgd_optimizer(0.01))
        step = make_train_step(m, private=True)
        state, metrics = step(state, {"image": x,
                                      "label": jnp.zeros(8, jnp.int32)})
        assert np.isfinite(float(metrics["loss"]))


class TestBF16:
    def test_bf16_train_step_and_f32_signature(self):
        m = _passport_alexnet("bn", private=True, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3))
        v = m.init(RNGS, x, train=True)
        state = TrainState.create(v, sgd_optimizer(0.01))
        step = make_train_step(m, private=True)
        for _ in range(3):
            state, metrics = step(state, {"image": x,
                                          "label": jnp.zeros(8, jnp.int32)})
        assert np.isfinite(float(metrics["loss"]))
        # derivation/decoding stays f32 regardless of compute dtype
        from deepipr_tpu.attacks.common import derived_affines

        aff = derived_affines(m, state.model_variables(), (1, 16, 16, 3), True)
        for aux in aff.values():
            assert aux["scale"].dtype == jnp.float32

    def test_bf16_resnet_forward(self):
        m = ResNet18(num_classes=10, dtype=jnp.bfloat16)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(RNGS, x, train=True)
        y = m.apply(v, x)
        assert y.shape == (2, 10)
        assert y.dtype == jnp.float32  # head stays f32
