"""Vmapped ensemble training (train/ensemble.py): N licensee models, each
with its own passports/signature, advanced by ONE compiled step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.passport.codec import decode_string
from deepipr_tpu.train.ensemble import (
    ensemble_size,
    init_ensemble,
    make_ensemble_signature_fn,
    make_ensemble_train_step,
    member_state,
    override_signature,
    setup_ensemble_passports,
    shard_ensemble,
    stack_states,
)
from deepipr_tpu.train.schedule import sgd_optimizer
from deepipr_tpu.train.steps import make_train_step

from test_train import tiny_passport_model, toy_batch


def small_ensemble(n=2, private=True, signatures=None):
    model = tiny_passport_model(private=private)
    ens = init_ensemble(
        model, sgd_optimizer(0.01), (2, 16, 16, 3), n=n, seed=7,
        signatures=signatures,
    )
    return model, ens


class TestStacking:
    def test_init_shapes_and_member_roundtrip(self):
        model, ens = small_ensemble(n=3)
        assert ensemble_size(ens) == 3
        # members differ (independent init rngs): compare conv kernels, not
        # the zero-initialized biases
        kernels = [
            leaf for path, leaf in
            jax.tree_util.tree_flatten_with_path(ens.params)[0]
            if any(getattr(k, "key", None) == "kernel" for k in path)
        ]
        assert kernels
        k = np.asarray(kernels[0])
        assert not np.allclose(k[0], k[1])
        # restack reproduces the ensemble
        re = stack_states([member_state(ens, i) for i in range(3)])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            jax.device_get(re.params), jax.device_get(ens.params))

    def test_empty_stack_rejected(self):
        with pytest.raises(ValueError, match="at least one"):
            stack_states([])

    def test_signatures_on_model_without_passports_rejected(self):
        from deepipr_tpu.models import AlexNet

        with pytest.raises(ValueError, match="no passport layers"):
            init_ensemble(AlexNet(num_classes=10), sgd_optimizer(0.01),
                          (2, 16, 16, 3), n=2, signatures=["a", "b"])

    def test_signature_count_mismatch_rejected(self):
        model = tiny_passport_model(private=True)
        with pytest.raises(ValueError, match="signatures"):
            init_ensemble(model, sgd_optimizer(0.01), (2, 16, 16, 3), n=3,
                          signatures=["a", "b"])


class TestEnsembleStep:
    @pytest.mark.parametrize("private", [True, False])
    def test_matches_independent_runs(self, private):
        """One vmapped step == N independent make_train_step runs, exactly."""
        model, ens = small_ensemble(n=2, private=private)
        batch = toy_batch(n=8)
        singles = [member_state(ens, i) for i in range(2)]

        estep = make_ensemble_train_step(model, private=private)
        sstep = make_train_step(model, private=private)
        for _ in range(3):
            ens, em = estep(ens, batch)
        for i in range(2):
            s = singles[i]
            for _ in range(3):
                s, sm = sstep(s, batch)
            singles[i] = (s, sm)

        for i, (s, sm) in enumerate(singles):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
                jax.device_get(member_state(ens, i).params),
                jax.device_get(s.params))
            for k, v in sm.items():
                assert float(em[k][i]) == pytest.approx(float(v), rel=1e-4,
                                                        abs=1e-5), (i, k)

    def test_per_member_data(self):
        model, ens = small_ensemble(n=2)
        b0, b1 = toy_batch(n=8, seed=0), toy_batch(n=8, seed=1)
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)
        member1 = jax.tree.map(jnp.copy, member_state(ens, 1))
        estep = make_ensemble_train_step(model, private=True,
                                         per_member_data=True)
        ens2, m = estep(ens, stacked)  # donates ens
        sstep = make_train_step(model, private=True)
        s1, m1 = sstep(member1, b1)
        assert float(m["loss"][1]) == pytest.approx(float(m1["loss"]),
                                                    rel=1e-5)


class TestEnsembleEpochScan:
    def test_matches_per_step_ensemble(self):
        """Scanned fleet epoch == per-step vmapped steps over the same
        permutation and augmentation stream."""
        from deepipr_tpu.data.device_augment import make_device_augment
        from deepipr_tpu.train.ensemble import make_ensemble_epoch_fn

        model, ens = small_ensemble(n=2)
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, (32, 16, 16, 3)).astype(np.uint8)
        y = rng.integers(0, 10, 32).astype(np.int32)
        bs, pad = 16, 2
        host = jax.tree.map(np.asarray, ens)

        epoch_fn = make_ensemble_epoch_fn(model, True, bs, pad)
        key = jax.random.key(11)
        e_scan, m_scan = epoch_fn(jax.tree.map(jnp.asarray, host),
                                  jnp.asarray(x), jnp.asarray(y), key)

        aug = make_device_augment(pad)
        estep = make_ensemble_train_step(model, True, device_augment=aug)
        perm = np.asarray(jax.random.permutation(key, len(x)))
        e_loop = jax.tree.map(jnp.asarray, host)
        for t in range(len(x) // bs):
            idx = perm[t * bs:(t + 1) * bs]
            e_loop, m = estep(e_loop, {"image": jnp.asarray(x[idx]),
                                       "label": jnp.asarray(y[idx])})
        # scan vs loop compile the vmapped convs into different batched
        # forms; per-op reassociation drift reaches ~1e-5 absolute on the
        # kernels after two steps — far below the 1e-1 parameter scale
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5),
            jax.device_get(e_scan.params), jax.device_get(e_loop.params))
        assert m_scan["loss"].shape == (2,)


class TestLicenseeSignatures:
    def test_distinct_ascii_signatures_train_and_decode(self):
        """Two licensees embed different strings; training the stacked pair
        drives both sign accuracies up and each decodes its own string."""
        model, ens = small_ensemble(n=2, signatures=["Ab", "Zq"])
        batch = toy_batch(n=8)
        estep = make_ensemble_train_step(model, private=True)
        sigfn = make_ensemble_signature_fn(model, (1, 16, 16, 3), private=True)

        before = sigfn(ens)
        for _ in range(60):
            ens, m = estep(ens, batch)
        after = sigfn(ens)
        for path in after:
            assert after[path].shape == (2,)
            assert (after[path] >= before[path] - 1e-6).all()
            assert (after[path] == 1.0).all(), (path, after[path])

        # decode each member's embedded string from its own derived scales
        # (every passport layer of member i embeds member i's string in its
        # leading channels)
        from deepipr_tpu.attacks.common import derived_affines

        for i, text in enumerate(("Ab", "Zq")):
            st = member_state(ens, i)
            affs = derived_affines(
                model, st.model_variables(), (1, 16, 16, 3), private=True)
            assert affs
            for a in affs.values():
                scale = np.asarray(a["scale"]).flatten()
                assert decode_string(scale[: len(text) * 8]) == text

    def test_nested_same_named_layers_get_independent_tails(self):
        """ResNet-style nested signature trees: layer4_0/convbn_2 and
        layer4_1/convbn_2 must NOT share a signature rng — the random tail
        beyond the ASCII prefix has to differ per layer path."""
        sig = {
            "layer4_0": {"convbn_2": {"b": jnp.ones((512,))}},
            "layer4_1": {"convbn_2": {"b": jnp.ones((512,))}},
        }
        out = override_signature(sig, "Hi", seed=0)
        b0 = np.asarray(out["layer4_0"]["convbn_2"]["b"])
        b1 = np.asarray(out["layer4_1"]["convbn_2"]["b"])
        np.testing.assert_array_equal(b0[:16], b1[:16])  # same ASCII prefix
        assert not np.array_equal(b0[16:], b1[16:])  # independent tails

    def test_override_signature_is_deterministic(self):
        model, ens = small_ensemble(n=1)
        sig = jax.device_get(member_state(ens, 0).signature)
        a = override_signature(sig, "Hi", seed=3)
        b = override_signature(sig, "Hi", seed=3)
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)
        c = override_signature(sig, "Hi", seed=4)
        # ASCII prefix identical, random tail differs with the seed
        leaves_a = jax.tree.leaves(a)
        leaves_c = jax.tree.leaves(c)
        assert any(
            not np.array_equal(x, y) for x, y in zip(leaves_a, leaves_c))
        for x, y in zip(leaves_a, leaves_c):
            np.testing.assert_array_equal(x[:16], y[:16])  # 'Hi' = 16 bits


class TestEnsemblePassports:
    def test_members_get_distinct_passports(self):
        from deepipr_tpu.models import AlexNet

        model, ens = small_ensemble(n=2)
        pre = AlexNet(num_classes=10)  # pretrained normal model for the taps
        pv = pre.init({"params": jax.random.key(9)},
                      jnp.zeros((2, 16, 16, 3)), train=True)
        imgs = np.random.default_rng(0).standard_normal(
            (20, 16, 16, 3)).astype(np.float32)
        ens = setup_ensemble_passports(model, ens, pre, pv, imgs, imgs, seed=5)
        p0 = jax.tree.leaves(member_state(ens, 0).passport)[0]
        p1 = jax.tree.leaves(member_state(ens, 1).passport)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))


class TestShardedEnsemble:
    def test_sharded_matches_unsharded(self):
        """Member axis over 'model', batch over 'batch' on the 8-device CPU
        mesh — same trajectory as the unsharded run."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from deepipr_tpu.parallel.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs the virtual 8-device mesh")
        model, ens = small_ensemble(n=2)
        batch = toy_batch(n=8)
        estep = make_ensemble_train_step(model, private=True)

        ref = ens
        for _ in range(2):
            ref, ref_m = estep(ref, batch)

        mesh = make_mesh(model_axis=2)
        _, ens2 = small_ensemble(n=2)
        ens2 = shard_ensemble(ens2, mesh, axis_name="model")
        sb = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("batch") if x.ndim else P())),
            batch)
        for _ in range(2):
            ens2, m2 = estep(ens2, sb)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(ref.params), jax.device_get(ens2.params))
        assert float(ref_m["loss"][0]) == pytest.approx(
            float(m2["loss"][0]), rel=1e-5)
