"""Inference folding: conv+BN+affine collapse must preserve eval logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.interop.fold import fold_for_inference
from deepipr_tpu.models import AlexNet, ResNet18, build_model
from deepipr_tpu.train.schedule import sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import make_train_step
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _trained_state(model, private, n=8, size=16, steps=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, size, size, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, n).astype(np.int32))
    variables = model.init(RNGS, x, train=True)
    state = TrainState.create(variables, sgd_optimizer(0.01))
    step = make_train_step(model, private=private)
    for _ in range(steps):  # move BN stats + affines off their init values
        state, _ = step(state, {"image": x, "label": y})
    return state, x


def _passport_model(private):
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    return AlexNet(num_classes=10, passport_kwargs=kw, private=private)


class TestFold:
    @pytest.mark.parametrize("ind", [0, 1])
    def test_v2_private_branches(self, ind):
        model = _passport_model(private=True)
        state, x = _trained_state(model, private=True)
        variables = state.model_variables()
        want = model.apply(variables, x, ind=ind, train=False)

        fm, fv = fold_for_inference(model, variables, x.shape, ind=ind)
        got = fm.apply(fv, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        # deployment artifact: no passports, signatures, or BN stats inside
        assert set(fv) == {"params"}

    def test_v1_derived(self):
        model = _passport_model(private=False)
        state, x = _trained_state(model, private=False)
        variables = state.model_variables()
        want = model.apply(variables, x, train=False)
        fm, fv = fold_for_inference(model, variables, x.shape)
        got = fm.apply(fv, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_normal_resnet_bn_affine(self):
        model = ResNet18(num_classes=10)
        state, x = _trained_state(model, private=False)
        variables = state.model_variables()
        want = model.apply(variables, x, train=False)
        fm, fv = fold_for_inference(model, variables, x.shape)
        got = fm.apply(fv, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_resnet_private_flagship_config(self):
        import json

        cfg = json.load(open("passport_configs/resnet18_passport.json"))
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
        state, x = _trained_state(model, private=True)
        variables = state.model_variables()
        for ind in (0, 1):
            want = model.apply(variables, x, ind=ind, train=False)
            fm, fv = fold_for_inference(model, variables, x.shape, ind=ind)
            got = fm.apply(fv, x, train=False)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_groupnorm_rejected(self):
        model = build_model("alexnet", 10, norm_type="gn")
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init(RNGS, x, train=True)
        with pytest.raises(ValueError, match="norm_type"):
            fold_for_inference(model, variables, x.shape)
