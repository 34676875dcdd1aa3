"""Pallas fused passport epilogue: correctness vs the XLA reference path.

Runs in interpreter mode (tests are on CPU); the same kernel compiles for TPU
via Mosaic and is exercised by benchmarks/bench_epilogue.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.ops.pallas_fused import (
    epilogue_fits_vmem,
    passport_epilogue_pallas,
)


def _reference(y, ko, so, mean, var, eps=1e-5, relu=True):
    scale = jnp.mean(so, axis=(0, 1, 2))
    bias = jnp.mean(ko, axis=(0, 1, 2))
    yn = (y - mean) * jax.lax.rsqrt(var + eps)
    out = scale * yn + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out, scale, bias


@pytest.mark.parametrize(
    "shape",
    [
        (4, 8, 8, 128),
        (2, 16, 16, 256),
        # ImageNet-resolution blocks (ResNet layer1/layer2) — the exact block
        # shapes benchmarks/bench_epilogue.py runs on hardware; validated here
        # in interpret mode first (see CLAUDE.md: never debug Mosaic shapes
        # against the live chip).
        (2, 56, 56, 64),
        (2, 28, 28, 128),
    ],
)
@pytest.mark.parametrize("relu", [True, False])
def test_epilogue_matches_xla(shape, relu):
    n, h, w, c = shape
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ko = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    so = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))

    out, scale, bias = passport_epilogue_pallas(
        y, ko, so, mean, var, relu=relu, interpret=True
    )
    ref_out, ref_scale, ref_bias = _reference(y, ko, so, mean, var, relu=relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale[0]), np.asarray(ref_scale),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bias[0]), np.asarray(ref_bias),
                               rtol=1e-5, atol=1e-6)


def test_vmem_guard():
    assert epilogue_fits_vmem(32, 32, 512)
    assert not epilogue_fits_vmem(224, 224, 512)


class TestIntegratedEpilogue:
    """The Pallas epilogue wired into the passport blocks (eval path).

    'interpret' mode lets the dispatch run on CPU; outputs must match the
    XLA path ('off') exactly up to float tolerance.
    """

    def _private_block_outputs(self, mode):
        import flax.linen as nn
        from deepipr_tpu.models.layers import PassportPrivateBlock
        from deepipr_tpu.ops.pallas_fused import set_epilogue_mode

        block = PassportPrivateBlock(features=256, norm_type="bn", alpha=0.1,
                                     b_spec=7)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 16)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
        v = block.init(rngs, x, train=True)
        # a few train steps' worth of stat updates so running stats are not
        # the init zeros/ones
        _, upd = block.apply(v, x, ind=1, train=True,
                             mutable=["batch_stats", "passport_aux"])
        v = {**v, "batch_stats": upd["batch_stats"]}
        set_epilogue_mode(mode)
        try:
            y, upd = block.apply(v, x, ind=1, train=False,
                                 mutable=["passport_aux"])
        finally:
            set_epilogue_mode("auto")
        from deepipr_tpu.train.steps import collect_aux
        aux = collect_aux(upd)[0]
        return np.asarray(y), np.asarray(aux["scale"]), np.asarray(aux["bias"])

    def test_private_eval_matches_xla_path(self):
        y_off, s_off, b_off = self._private_block_outputs("off")
        y_pl, s_pl, b_pl = self._private_block_outputs("interpret")
        np.testing.assert_allclose(y_pl, y_off, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s_pl, s_off, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(b_pl, b_off, rtol=1e-5, atol=1e-6)

    def test_v1_block_eval_matches_xla_path(self):
        from deepipr_tpu.models.layers import PassportBlock
        from deepipr_tpu.ops.pallas_fused import set_epilogue_mode

        block = PassportBlock(features=256, norm_type="bn", alpha=0.1, b_spec=3)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
        rngs = {"params": jax.random.key(2), "passport": jax.random.key(3)}
        v = block.init(rngs, x, train=True)
        _, upd = block.apply(v, x, train=True,
                             mutable=["batch_stats", "passport_aux"])
        v = {**v, "batch_stats": upd["batch_stats"]}
        y_off = block.apply(v, x, train=False)
        set_epilogue_mode("interpret")
        try:
            y_pl = block.apply(v, x, train=False)
        finally:
            set_epilogue_mode("auto")
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_off),
                                   rtol=1e-5, atol=1e-5)

    def test_auto_mode_off_on_cpu(self):
        from deepipr_tpu.ops.pallas_fused import epilogue_should_run
        # CPU backend: the auto heuristic must never dispatch to Mosaic
        assert not epilogue_should_run(256, 4, 4, 512)

    def test_stats_batchnorm_is_plain_batchnorm(self):
        import flax.linen as nn
        from deepipr_tpu.ops.norms import StatsBatchNorm
        assert issubclass(StatsBatchNorm, nn.BatchNorm)
        sbn = StatsBatchNorm(momentum=0.9, epsilon=1e-5, use_scale=False,
                             use_bias=False)
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3, 3, 8))
                        .astype(np.float32))
        v = sbn.init(jax.random.key(0), x, use_running_average=False)
        y, upd = sbn.apply(v, x, use_running_average=False,
                           mutable=["batch_stats"])
        ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_scale=False,
                           use_bias=False)
        y_ref, upd_ref = ref.apply(v, x, use_running_average=False,
                                   mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            upd, upd_ref,
        )
        # the accessor returns the stored running stats
        mean, var = sbn.apply(v, 8, method=StatsBatchNorm.running_stats)
        np.testing.assert_array_equal(np.asarray(mean),
                                      np.asarray(v["batch_stats"]["mean"]))
        np.testing.assert_array_equal(np.asarray(var),
                                      np.asarray(v["batch_stats"]["var"]))
