"""Bottleneck passport models (ResNet-50 family) — a capability extension.

The reference's passport machinery stops at BasicBlock (its get_convblock
only handles BasicBlock sub-names, models/resnet_passport.py:10-17; only
ResNet18 gets a private factory, resnet_passport_private.py:185-186). Here
Bottleneck positions accept passport/private blocks with the same config
format; convbn_3/shortcut keep relu=False so residual-add semantics match
the normal Bottleneck.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepipr_tpu.models import ResNet50, ResNet50Passport, ResNet50Private
from deepipr_tpu.models.branching import branch_point
from deepipr_tpu.train.keys import sample_candidates, setup_passports
from deepipr_tpu.train.schedule import sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import make_signature_fn, make_train_step
from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}
SHAPE = (2, 32, 32, 3)


@pytest.fixture(scope="module")
def kwargs_plkeys():
    cfg = load_passport_config("passport_configs/resnet50_passport.json")
    return construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)


@pytest.fixture(scope="module")
def private(kwargs_plkeys):
    kwargs, plkeys = kwargs_plkeys
    model = ResNet50Private(num_classes=10, passport_kwargs=kwargs)
    variables = model.init(RNGS, jnp.zeros(SHAPE, jnp.float32), train=True)
    return model, variables, plkeys


def test_config_flags_all_layer4_sub_blocks(kwargs_plkeys):
    _, plkeys = kwargs_plkeys
    # 3 bottleneck blocks x 3 convs + block 0's projection shortcut
    assert len(plkeys) == 10
    assert all(k.startswith("layer4.") for k in plkeys)
    assert "layer4.0.shortcut" in plkeys


def test_dual_branch_forward(private):
    model, variables, _ = private
    x = jnp.asarray(np.random.default_rng(0).standard_normal(SHAPE), jnp.float32)
    pub = model.apply(variables, x, ind=0, train=False)
    priv = model.apply(variables, x, ind=1, train=False)
    assert pub.shape == priv.shape == (2, 10)
    assert np.any(np.asarray(pub) != np.asarray(priv))


def test_normal_resnet50_params_unchanged_by_passport_support():
    """Passport-enabling Bottleneck must not move the normal model's params."""
    model = ResNet50(num_classes=10)
    v = model.init({"params": jax.random.key(0)}, jnp.zeros(SHAPE, jnp.float32),
                   train=True)
    p = v["params"]["layer4_0"]
    assert set(p) == {"convbnrelu_1", "convbnrelu_2", "convbn_3", "shortcut"}
    assert p["convbn_3"]["conv"]["kernel"].shape == (1, 1, 512, 2048)


def test_key_setup_and_split_train_step(private):
    model, variables, _ = private
    # passports from a pretrained NORMAL resnet50, like the reference flow
    normal = ResNet50(num_classes=10)
    nv = normal.init({"params": jax.random.key(7)},
                     jnp.zeros(SHAPE, jnp.float32), train=True)
    imgs = np.random.default_rng(1).standard_normal((20, 32, 32, 3)).astype(np.float32)
    kx = sample_candidates(imgs, 20, seed=0)
    new_pp = setup_passports(normal, nv, variables["passport"], kx, kx, seed=0)
    variables = dict(variables)
    variables["passport"] = new_pp

    assert branch_point(model) is not None  # split fires (passports in layer4)
    state = TrainState.create(variables, sgd_optimizer(0.01))
    step = make_train_step(model, private=True)
    batch = {
        "image": np.random.default_rng(2).standard_normal((4, 32, 32, 3)).astype(np.float32),
        "label": np.array([0, 1, 2, 3], np.int32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["sign_acc"]) <= 1.0

    sig_fn = make_signature_fn(model, (1, 32, 32, 3), private=True)
    per_layer = sig_fn(state)
    assert len(per_layer) == 10
    assert all(0.0 <= v <= 1.0 for v in per_layer.values())


def test_v1_bottleneck_passport_forward(kwargs_plkeys):
    kwargs, _ = kwargs_plkeys
    model = ResNet50Passport(num_classes=10, passport_kwargs=kwargs)
    variables = model.init(RNGS, jnp.zeros(SHAPE, jnp.float32), train=True)
    y = model.apply(variables, jnp.ones(SHAPE, jnp.float32), train=False)
    assert y.shape == (2, 10)


def test_registry_builds_resnet50():
    from deepipr_tpu.models import build_model

    m = build_model("resnet50", 10)
    v = m.init({"params": jax.random.key(0)}, jnp.zeros(SHAPE, jnp.float32),
               train=True)
    assert m.apply(v, jnp.ones(SHAPE, jnp.float32), train=False).shape == (2, 10)
