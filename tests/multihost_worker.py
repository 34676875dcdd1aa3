"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_distributed.py::TestTwoProcessSmoke as two real OS
processes (coordinator + worker) with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment and 4 virtual CPU
devices each, forming one 8-device global mesh. Exercises the init path in
deepipr_tpu/parallel/distributed.py end-to-end — not just its env parsing —
plus cross-process batch sharding and the gradient all-reduce.

The training body (run_training) is also imported by the test itself to
produce the single-process reference on its 8-device mesh: identical code,
so any param divergence is attributable to the distributed runtime.
"""

import os
import sys

import numpy as np


def run_training(steps: int = 3):
    """A few V2 private train steps on a global ('batch','model') mesh.

    Deterministic in every input (fixed init keys, fixed data rng), so two
    processes of one distributed job — and a single-process run — must all
    produce the same replicated params.
    """
    import jax
    import jax.numpy as jnp

    from deepipr_tpu.models import AlexNet
    from deepipr_tpu.parallel import make_mesh, replicate, shard_batch
    from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
    from deepipr_tpu.utils.config import construct_passport_kwargs

    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)

    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros((1, 16, 16, 3)), train=True)
    state = TrainState.create(variables, sgd_optimizer(0.01))

    mesh = make_mesh()  # all 8 global devices, spanning both processes
    state = replicate(state, mesh)
    step = make_train_step(model, private=True)

    rng = np.random.default_rng(0)
    losses = []
    for _ in range(steps):
        batch = {
            # every process materializes the same GLOBAL batch; device_put
            # with the batch sharding keeps only the local shards
            "image": rng.normal(size=(16, 16, 16, 3)).astype(np.float32),
            "label": rng.integers(0, 10, 16).astype(np.int32),
        }
        state, metrics = step(state, shard_batch(batch, mesh))
        losses.append(float(metrics["loss"]))  # replicated -> addressable
    params = jax.device_get(state.params)  # replicated -> full copies
    flat = np.concatenate([np.ravel(x) for x in jax.tree.leaves(params)])
    return losses, flat


def main():
    out_path = sys.argv[1]
    # the axon sitecustomize pins the platform; override post-import
    # (same mechanism as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from deepipr_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed() is True, "env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    losses, flat = run_training()
    np.savez(out_path, losses=np.asarray(losses), flat=flat,
             process_id=int(os.environ["JAX_PROCESS_ID"]))
    print("WORKER-OK", os.environ["JAX_PROCESS_ID"], flush=True)


if __name__ == "__main__":
    main()
