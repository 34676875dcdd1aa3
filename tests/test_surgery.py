"""Model surgery unit tests: passport<->normal weight conversions."""

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.interop.surgery import (
    copy_matching,
    normal_to_normal,
    normal_to_passport,
    passport_to_normal,
)
from deepipr_tpu.models import AlexNet
from deepipr_tpu.utils.config import construct_passport_kwargs
from deepipr_tpu.utils.tree import flatten_paths

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}
SHAPE = (1, 16, 16, 3)


def _pair(learnable=False):
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, plkeys = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    if learnable:
        for k in ("4", "5", "6"):
            kw[k]["learnable_affine"] = True
    pm = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    nm = AlexNet(num_classes=10)
    pv = pm.init(RNGS, jnp.zeros(SHAPE), train=True)
    nv = nm.init(RNGS, jnp.zeros(SHAPE), train=True)
    plpaths = [f"features_{k}" for k in ("4", "5", "6")]
    return pm, pv, nm, nv, plpaths


def test_passport_to_normal_materializes_derived_affine():
    pm, pv, nm, nv, plpaths = _pair()
    affines = derived_affines(pm, pv, SHAPE, private=True)
    params, stats = passport_to_normal(
        pv["params"], pv["batch_stats"], affines,
        nv["params"], nv["batch_stats"], plpaths,
    )
    flat = flatten_paths(params)
    for p in plpaths:
        np.testing.assert_array_equal(
            np.asarray(flat[f"{p}/bn/scale"]),
            np.asarray(affines[p]["scale"]).reshape(-1),
        )
        # conv kernels copied
        np.testing.assert_array_equal(
            np.asarray(flat[f"{p}/conv/kernel"]),
            np.asarray(pv["params"][p]["conv"]["kernel"]),
        )
    # the normal model runs with the converted weights
    nmv = {"params": params, "batch_stats": stats}
    y = nm.apply(nmv, jnp.zeros(SHAPE))
    assert y.shape == (1, 10)


def test_normal_to_passport_affine_into_learnable_scale():
    pm, pv, nm, nv, plpaths = _pair()
    params, stats = normal_to_passport(
        nv["params"], nv["batch_stats"], pv["params"], pv["batch_stats"],
        plpaths,
    )
    flat = flatten_paths(params)
    nflat = flatten_paths(nv["params"])
    for p in plpaths:
        np.testing.assert_array_equal(
            np.asarray(flat[f"{p}/scale"]),
            np.asarray(nflat[f"{p}/bn/scale"]),
        )


def test_normal_to_normal_skips_last_classifier():
    nm = AlexNet(num_classes=10)
    nm2 = AlexNet(num_classes=10)
    v1 = nm.init(RNGS, jnp.zeros(SHAPE), train=True)
    v2 = nm2.init({"params": jax.random.key(7)}, jnp.zeros(SHAPE), train=True)
    params, _ = normal_to_normal(v1["params"], v1["batch_stats"],
                                 v2["params"], v2["batch_stats"])
    f1, f2, fo = (flatten_paths(t) for t in (v1["params"], v2["params"], params))
    np.testing.assert_array_equal(np.asarray(fo["features_0/conv/kernel"]),
                                  np.asarray(f1["features_0/conv/kernel"]))
    # classifier stays the destination's own (rtal semantics)
    np.testing.assert_array_equal(np.asarray(fo["classifier/kernel"]),
                                  np.asarray(f2["classifier/kernel"]))


def test_copy_matching_skips_shape_mismatch():
    nm10 = AlexNet(num_classes=10)
    nm100 = AlexNet(num_classes=100)
    v10 = nm10.init(RNGS, jnp.zeros(SHAPE), train=True)
    v100 = nm100.init({"params": jax.random.key(3)}, jnp.zeros(SHAPE),
                      train=True)
    merged = copy_matching(v10["params"], v100["params"])
    f = flatten_paths(merged)
    assert f["classifier/kernel"].shape[-1] == 100  # kept destination
    np.testing.assert_array_equal(
        np.asarray(f["features_0/conv/kernel"]),
        np.asarray(flatten_paths(v10["params"])["features_0/conv/kernel"]),
    )
