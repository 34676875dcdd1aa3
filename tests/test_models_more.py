"""Extra model-zoo coverage: ImageNet-shape passports, V1 ResNet passport."""

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.models import AlexNet, ResNet18Passport, ResNet9Passport
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def test_imagenet_alexnet_passport_shapes():
    """Passport spatial dims track the ImageNet feature maps (k=11 s=4 stem)."""
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    m = AlexNet(num_classes=1000, passport_kwargs=kw)
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init({**RNGS, "dropout": jax.random.key(2)}, x, train=True)
    # after stem(55)->pool(27)->conv(27)->pool(13): passports live at 13x13
    assert v["passport"]["features_4"]["key"].shape == (1, 13, 13, 192)
    y = m.apply(v, x)
    assert y.shape == (1, 1000)


def test_resnet18_v1_passport_trains():
    cfg = load_passport_config("passport_configs/resnet18_passport.json")
    kw, plkeys = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    assert len(plkeys) == 5
    m = ResNet18Passport(num_classes=10, passport_kwargs=kw)
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3))
    v = m.init(RNGS, x, train=True)
    # layer4 passports at 8x8 input resolution entering layer4
    assert v["passport"]["layer4_0"]["convbnrelu_1"]["key"].shape == (1, 8, 8, 256)
    state = TrainState.create(v, sgd_optimizer(0.01))
    step = make_train_step(m, private=False)
    state, metrics = step(state, {"image": x, "label": jnp.zeros(8, jnp.int32)})
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["sign_loss"]) > 0  # five passport layers contribute


def test_resnet9_passport_forward():
    cfg = load_passport_config("passport_configs/resnet9_passport.json")
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    m = ResNet9Passport(num_classes=10, passport_kwargs=kw)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(RNGS, x, train=True)
    assert m.apply(v, x).shape == (2, 10)
