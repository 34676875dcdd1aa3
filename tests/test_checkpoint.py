"""Checkpointing: msgpack + orbax round-trips preserve the full train state."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.models import AlexNet
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.utils.checkpoint import (
    load_state,
    load_state_orbax,
    save_state,
    save_state_orbax,
)
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _trained_state():
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    x = jnp.ones((4, 16, 16, 3))
    v = model.init(RNGS, x, train=True)
    state = TrainState.create(v, sgd_optimizer(0.01))
    step = make_train_step(model, private=True)
    batch = {"image": x, "label": jnp.zeros(4, jnp.int32)}
    for _ in range(2):
        state, _ = step(state, batch)
    return model, state


def _assert_states_equal(a, b):
    assert int(a.step) == int(b.step)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_msgpack_roundtrip_preserves_everything(tmp_path):
    model, state = _trained_state()
    path = os.path.join(tmp_path, "models", "ck.ckpt")
    save_state(path, state)
    template = TrainState.create(
        model.init(RNGS, jnp.ones((4, 16, 16, 3)), train=True),
        sgd_optimizer(0.01),
    )
    restored = load_state(path, template)
    _assert_states_equal(jax.device_get(state), restored)
    assert int(restored.step) == 2  # optimizer/step state survives


def test_orbax_roundtrip(tmp_path):
    _, state = _trained_state()
    d = os.path.join(tmp_path, "orbax_ck")
    save_state_orbax(d, state)
    restored = load_state_orbax(d, jax.device_get(state))
    _assert_states_equal(jax.device_get(state), restored)


def test_weights_only_load_across_optimizer_shapes(tmp_path):
    """A checkpoint trained with an LR SCHEDULE must load into a constant-LR
    template when restore_opt=False (the attack-CLI / pretrained-weights
    path). Full restore across mismatched optimizers raises — regression for
    the opt_state/2 count mismatch hit by passport_attack_{2,3} on scheduled
    checkpoints."""
    import pytest

    from deepipr_tpu.models import build_model
    from deepipr_tpu.train.schedule import multistep_lr, sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state, save_state

    model = build_model("alexnet", 10)
    v = model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=True)
    sched = multistep_lr(0.01, {"type": "steps", "steps": [2], "gamma": 0.1}, 4)
    trained = TrainState.create(v, sgd_optimizer(sched))
    trained = trained.replace(step=trained.step + 7)
    path = str(tmp_path / "sched.ckpt")
    save_state(path, trained)

    template = TrainState.create(v, sgd_optimizer(0.01))  # constant LR
    with pytest.raises(ValueError):
        load_state(path, template)  # full restore: structure mismatch

    restored = load_state(path, template, restore_opt=False)
    assert int(restored.step) == 0  # template's, not the checkpoint's
    jax.tree.map(np.testing.assert_array_equal, restored.params, trained.params)
    # and the optimizer still steps
    restored.apply_gradients(jax.tree.map(jnp.zeros_like, restored.params))


def test_async_checkpointer_matches_sync(tmp_path):
    from deepipr_tpu.utils.checkpoint import AsyncCheckpointer

    model, state = _trained_state()
    sync_path = str(tmp_path / "sync.ckpt")
    async_path = str(tmp_path / "async.ckpt")
    save_state(sync_path, state)
    ck = AsyncCheckpointer()
    ck.save(async_path, state)
    ck.flush()
    assert open(sync_path, "rb").read() == open(async_path, "rb").read()
    restored = load_state(async_path, state)
    _assert_states_equal(state, restored)


def test_async_snapshot_survives_donation(tmp_path):
    """The snapshot is taken before the next train step donates (deletes)
    the state buffers — the background write must still see the old state."""
    from deepipr_tpu.utils.checkpoint import AsyncCheckpointer

    model, state = _trained_state()
    want_step = int(state.step)
    ck = AsyncCheckpointer()
    path = str(tmp_path / "pre.ckpt")
    ck.save(path, state)
    step = make_train_step(model, private=True)
    x = jnp.ones((4, 16, 16, 3))
    state2, _ = step(state, {"image": x, "label": jnp.zeros(4, jnp.int32)})
    ck.flush()
    restored = load_state(path, state2)
    assert int(restored.step) == want_step == int(state2.step) - 1


def test_async_flush_raises_save_errors(tmp_path):
    from deepipr_tpu.utils.checkpoint import AsyncCheckpointer

    _, state = _trained_state()
    ck = AsyncCheckpointer()
    bad_dir = tmp_path / "f"
    bad_dir.write_text("a file, not a dir")
    ck.save(str(bad_dir / "x.ckpt"), state)
    import pytest

    with pytest.raises(Exception):
        ck.flush()
    # the checkpointer stays usable after an error
    good = str(tmp_path / "ok.ckpt")
    ck.save(good, state)
    ck.flush()
    assert os.path.exists(good)


def test_save_is_atomic_no_tmp_left(tmp_path):
    _, state = _trained_state()
    p = str(tmp_path / "a.ckpt")
    save_state(p, state)
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
