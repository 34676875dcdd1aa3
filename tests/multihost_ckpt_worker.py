"""Worker for the 2-process multihost checkpoint interrupt/resume test.

Launched by tests/test_distributed.py::TestMultihostCheckpoint as two real OS
processes forming one 8-device global mesh (4 virtual CPU devices each).
Exercises the sharded-state checkpoint semantics the reference never needed
(single-GPU .pth saves, experiments/base.py:139-150):

  1. uninterrupted run: 4 deterministic train steps        -> baseline params
  2. interrupted run:   2 steps, save_state_multihost      -> ckpt (proc 0
     writes, barrier; replicated leaves span both processes so the gather
     path, not plain device_get, produces the host value)
  3. resume:            fresh template, load_state_multihost (all-process
     read + replicated device commit), steps 2..3          -> resumed params
  4. assert resumed == baseline bit-for-bit, on every process
  5. a genuinely model-sharded state (shard_model_parallel over the 2-wide
     'model' axis) round-trips through the same save/load to the identical
     host value — covering non-addressable, non-replicated leaves.
"""

import os
import sys

import numpy as np


def _batch(i):
    rng = np.random.default_rng(1000 + i)
    return {
        "image": rng.normal(size=(16, 16, 16, 3)).astype(np.float32),
        "label": rng.integers(0, 10, 16).astype(np.int32),
    }


def main():
    ckpt_dir = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from deepipr_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed() is True, "env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp

    from deepipr_tpu.models import AlexNet
    from deepipr_tpu.parallel import (
        make_mesh,
        replicate,
        shard_batch,
        shard_model_parallel,
    )
    from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
    from deepipr_tpu.utils.checkpoint import (
        load_state_multihost,
        save_state_multihost,
    )
    from deepipr_tpu.utils.config import construct_passport_kwargs

    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}

    def fresh_state():
        v = model.init(rngs, jnp.zeros((1, 16, 16, 3)), train=True)
        return TrainState.create(v, sgd_optimizer(0.01))

    # 4 batch x 2 model: the DP runs use only the 'batch' axis; the 2-wide
    # 'model' axis gives shard_model_parallel real (non-trivial) shards.
    mesh = make_mesh(model_axis=2)
    step = make_train_step(model, private=True)

    def run(state, lo, hi):
        for i in range(lo, hi):
            state, _ = step(state, shard_batch(_batch(i), mesh))
        return state

    def flat(state):
        host = jax.device_get(state.params)
        return np.concatenate([np.ravel(x) for x in jax.tree.leaves(host)])

    # 1. uninterrupted baseline
    baseline = run(replicate(fresh_state(), mesh), 0, 4)

    # 2. interrupted run + multihost save
    ckpt = os.path.join(ckpt_dir, "mid.ckpt")
    mid = run(replicate(fresh_state(), mesh), 0, 2)
    assert not mid.params["features_0"]["conv"]["kernel"].is_fully_addressable
    save_state_multihost(ckpt, mid)
    assert os.path.exists(ckpt), "barrier released before proc 0 wrote"

    # 3. all-process restore with replicated device commit, then continue
    restored = load_state_multihost(ckpt, fresh_state(), mesh=mesh)
    k = restored.params["features_0"]["conv"]["kernel"]
    assert isinstance(k.sharding, jax.sharding.NamedSharding)
    assert k.sharding.mesh.shape == {"batch": 4, "model": 2}
    assert int(restored.step) == 2, int(restored.step)
    resumed = run(restored, 2, 4)

    # 4. resume is indistinguishable from never stopping
    np.testing.assert_array_equal(flat(resumed), flat(baseline))
    assert int(resumed.step) == int(baseline.step) == 4

    # 5. genuinely model-sharded leaves round-trip to the same host value
    tp_ckpt = os.path.join(ckpt_dir, "tp.ckpt")
    tp_state = shard_model_parallel(mid, mesh)
    cls = tp_state.params["classifier"]["kernel"]
    assert "model" in str(cls.sharding.spec), cls.sharding
    assert not cls.is_fully_addressable
    save_state_multihost(tp_ckpt, tp_state)
    tp_restored = load_state_multihost(tp_ckpt, fresh_state(), mesh=mesh)
    np.testing.assert_array_equal(flat(tp_restored), flat(mid))

    print("CKPT-OK", os.environ["JAX_PROCESS_ID"], flush=True)


if __name__ == "__main__":
    main()
