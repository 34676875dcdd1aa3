"""Separate-stats checkpoints through the attack stack (round-3 regression).

The 200-epoch canonical checkpoint (trained with --separate-stats) exposed a
silent failure chain: flax's from_state_dict DROPS checkpoint keys missing
from the template, so loading a separate-stats checkpoint into a
shared-stats attack model kept only the PUBLIC branch's running stats — the
private branch then evaluated at chance (9.8%) and the whole attack grid
measured a model nobody trained. These tests pin the three fixes:

  1. attacks.cli_common auto-detects bn_private in the checkpoint;
  2. utils.checkpoint.load_state warns loudly on dropped keys;
  3. the materialized-affine paths (flip_attack, passport_to_normal) pair
     private-derived affines with bn_private's statistics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepipr_tpu.models import AlexNet
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.train.steps import make_eval_step, run_eval
from deepipr_tpu.utils.checkpoint import load_state, save_state
from deepipr_tpu.utils.config import (
    construct_passport_kwargs,
    mark_separate_stats,
)

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}
CFG = {"0": False, "2": False, "4": True, "5": True, "6": True}


def build(separate: bool):
    kw, plkeys = construct_passport_kwargs(CFG, "bn", "shuffle", 0.1)
    if separate:
        mark_separate_stats(kw)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    v = model.init(RNGS, jnp.zeros((2, 16, 16, 3)), train=True)
    return model, TrainState.create(v, sgd_optimizer(0.01)), plkeys


@pytest.fixture(scope="module")
def trained_separate():
    """Tiny separate-stats private model trained until the two branches'
    running stats genuinely diverge."""
    model, state, plkeys = build(separate=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 16, 16, 3)).astype(np.float32)
    y = rng.integers(0, 10, 256).astype(np.int32)
    step = make_train_step(model, private=True)
    for _ in range(3):
        for i in range(0, 256, 64):
            state, m = step(state, {"image": jnp.asarray(x[i:i + 64]),
                                    "label": jnp.asarray(y[i:i + 64])})
    from deepipr_tpu.utils.tree import flatten_paths

    flat = dict(flatten_paths(jax.device_get(state.batch_stats)))
    # features_4's two stat sets coincide by construction (same conv, same
    # shared-prefix input); the branch affines make them diverge from the
    # NEXT passport layer on
    pub = flat["features_5/bn/var"]
    priv = flat["features_5/bn_private/var"]
    assert np.abs(pub - priv).max() > 1e-4, "stats did not diverge"
    valid = [{"image": jnp.asarray(x[i:i + 64]),
              "label": jnp.asarray(y[i:i + 64])} for i in (0, 64, 128, 192)]
    return model, state, plkeys, valid


class TestCheckpointDetection:
    def test_detects_bn_private(self, tmp_path, trained_separate):
        from deepipr_tpu.attacks.cli_common import _ckpt_has_separate_stats

        _, state, _, _ = trained_separate
        p = str(tmp_path / "sep.ckpt")
        save_state(p, state)
        assert _ckpt_has_separate_stats(p)

        _, shared_state, _ = build(separate=False)
        q = str(tmp_path / "shared.ckpt")
        save_state(q, shared_state)
        assert not _ckpt_has_separate_stats(q)

    def test_load_state_warns_on_dropped_keys(self, tmp_path, capsys,
                                              trained_separate):
        _, state, _, _ = trained_separate
        p = str(tmp_path / "sep.ckpt")
        save_state(p, state)
        _, shared_state, _ = build(separate=False)
        load_state(p, shared_state, restore_opt=False)
        out = capsys.readouterr().out
        assert "dropped" in out and "bn_private" in out

    def test_load_into_matching_template_is_silent(self, tmp_path, capsys,
                                                   trained_separate):
        model, state, _, _ = trained_separate
        p = str(tmp_path / "sep.ckpt")
        save_state(p, state)
        _, fresh, _ = build(separate=True)
        restored = load_state(p, fresh, restore_opt=False)
        assert "dropped" not in capsys.readouterr().out
        np.testing.assert_allclose(
            np.asarray(jax.device_get(restored.params)["features_4"]["scale"]),
            np.asarray(jax.device_get(state.params)["features_4"]["scale"]))


class TestMaterializedAffineConsistency:
    def test_flip_zero_matches_private_eval(self, trained_separate):
        """flip_attack at 0% flips must reproduce the private branch's
        accuracy — the materialized affines belong with bn_private stats."""
        from deepipr_tpu.attacks import flip_attack, plkey_to_module_path

        model, state, plkeys, valid = trained_separate
        plpaths = [plkey_to_module_path(k) for k in plkeys]
        private_eval = run_eval(
            make_eval_step(model, ind=1), state, valid)

        hist = flip_attack(model, state, valid, (1, 16, 16, 3), True,
                           plpaths=plpaths, percents=(0, 100))
        assert hist[0]["acc"] == pytest.approx(
            private_eval["acc"], abs=1.0), (
            "0%-flip eval diverged from the private branch")
        # sanity: heavy flips must actually hurt
        assert hist[1]["acc"] <= hist[0]["acc"]

    def test_passport_to_normal_pairs_private_stats(self, trained_separate):
        """The attack-2 normal-model transplant must evaluate like the
        private branch (its affines ARE the private branch's)."""
        from deepipr_tpu.attacks.common import derived_affines
        from deepipr_tpu.attacks import plkey_to_module_path
        from deepipr_tpu.interop.surgery import passport_to_normal

        model, state, plkeys, valid = trained_separate
        plpaths = [plkey_to_module_path(k) for k in plkeys]
        normal = AlexNet(num_classes=10)
        nv = normal.init({"params": jax.random.key(9)},
                         jnp.zeros((2, 16, 16, 3)), train=True)
        aff = derived_affines(model, state.model_variables(), (1, 16, 16, 3),
                              private=True)
        params, stats = passport_to_normal(
            state.params, state.batch_stats, aff, nv["params"],
            nv.get("batch_stats", {}), plpaths)
        nstate = TrainState.create(
            {"params": params, "batch_stats": stats}, sgd_optimizer(0.01))
        normal_eval = run_eval(make_eval_step(normal), nstate, valid)
        private_eval = run_eval(make_eval_step(model, ind=1), state, valid)
        assert normal_eval["acc"] == pytest.approx(
            private_eval["acc"], abs=1.0)
