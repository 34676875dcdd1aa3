"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via XLA's
host-platform device-count override. The session environment pins
JAX_PLATFORMS=axon (real TPU) via sitecustomize, so the platform must be
overridden through jax.config after import, not via env vars.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Golden tests compare against torch f32; avoid XLA's relaxed default matmul
# precision so convolutions accumulate in full f32.
jax.config.update("jax_default_matmul_precision", "highest")
