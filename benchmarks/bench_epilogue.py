#!/usr/bin/env python
"""Microbenchmark: Pallas fused passport epilogue vs the XLA lowering.

Times the eval-path epilogue (GAP derivation + BN normalize + affine + ReLU)
at the ResNet-18 layer4 shapes on the default (TPU) platform. Run when the
chip is healthy; prints one JSON line per variant.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.ops.pallas_fused import passport_epilogue_pallas


def xla_epilogue(y, ko, so, mean, var, eps=1e-5):
    scale = jnp.mean(so, axis=(0, 1, 2))
    bias = jnp.mean(ko, axis=(0, 1, 2))
    out = jnp.maximum(scale * ((y - mean) * jax.lax.rsqrt(var + eps)) + bias, 0.0)
    return out, scale, bias


def time_fn(fn, args, steps=50):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jax.tree.leaves(out)[0][0, 0, 0, 0])  # hard sync
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    float(jax.tree.leaves(out)[0][0, 0, 0, 0])
    return (time.time() - t0) / steps


def main():
    rng = np.random.default_rng(0)
    shapes = [
        # CIFAR ResNet-18 layer3/layer4 (dispatch-bound at ~16MB working set)
        (256, 8, 8, 256), (256, 4, 4, 512),
        # ImageNet ResNet-18 layer1/layer2 at serving batch sizes — the
        # bandwidth-bound regime the kernel targets (y alone is 51-205MB)
        (64, 56, 56, 64), (256, 56, 56, 64), (256, 28, 28, 128),
    ]
    for shape in shapes:
        n, h, w, c = shape
        y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ko = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        so = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        mean = jnp.zeros(c)
        var = jnp.ones(c)

        t_xla = time_fn(jax.jit(xla_epilogue), (y, ko, so, mean, var))
        t_pl = time_fn(jax.jit(passport_epilogue_pallas), (y, ko, so, mean, var))
        gb = (2 * y.size + 2 * ko.size) * 4 / 1e9
        print(json.dumps({
            "shape": list(shape),
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pl * 1e6, 1),
            "xla_gbps": round(gb / t_xla, 1),
            "pallas_gbps": round(gb / t_pl, 1),
        }))


if __name__ == "__main__":
    main()
