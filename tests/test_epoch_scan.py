"""Device-resident scanned-epoch training (train/epoch.py) must be
step-for-step identical to dispatching the same step function per batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.data.device_augment import make_device_augment
from deepipr_tpu.train.epoch import device_resident, make_epoch_train_fn
from deepipr_tpu.train.steps import make_train_step

from test_train import make_state, tiny_passport_model


def u8_data(n=64, size=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
    y = rng.integers(0, 10, n).astype(np.int32)
    return x, y


class TestEpochScan:
    @pytest.mark.parametrize("private", [True, False])
    def test_matches_per_step_dispatch(self, private):
        model = tiny_passport_model(private=private)
        x, y = u8_data()
        bs, pad = 16, 2
        state0 = make_state(model, jnp.zeros((2, 16, 16, 3)))
        host = jax.tree.map(np.asarray, state0)

        epoch_fn = make_epoch_train_fn(model, private, bs, pad)
        xs, ys = device_resident(x, y)
        key = jax.random.key(42)
        s_scan = jax.tree.map(jnp.asarray, host)
        s_scan, m_scan = epoch_fn(s_scan, xs, ys, key)

        # manual per-step loop over the SAME permutation and step function
        aug = make_device_augment(pad)
        step = make_train_step(model, private, device_augment=aug)
        perm = np.asarray(jax.random.permutation(key, len(x)))
        s_loop = jax.tree.map(jnp.asarray, host)
        ms = []
        for t in range(len(x) // bs):
            idx = perm[t * bs:(t + 1) * bs]
            s_loop, m = step(s_loop, {"image": jnp.asarray(x[idx]),
                                      "label": jnp.asarray(y[idx])})
            ms.append(m)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_scan.params), jax.device_get(s_loop.params))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_scan.batch_stats),
            jax.device_get(s_loop.batch_stats))
        for k in ms[0]:
            want = np.mean([float(m[k]) for m in ms])
            assert float(m_scan[k]) == pytest.approx(want, rel=1e-4,
                                                     abs=1e-5), k

    def test_v3_trigger_cycling_matches(self):
        model = tiny_passport_model(private=True)
        x, y = u8_data(n=32)
        wm_x, wm_y = u8_data(n=6, seed=5)
        bs, pad = 16, 2
        state0 = make_state(model, jnp.zeros((2, 16, 16, 3)))
        host = jax.tree.map(np.asarray, state0)

        epoch_fn = make_epoch_train_fn(model, True, bs, pad)
        xs, ys = device_resident(x, y)
        ws, wys = device_resident(wm_x, wm_y)
        key = jax.random.key(3)
        s_scan, _ = epoch_fn(jax.tree.map(jnp.asarray, host), xs, ys, key,
                             ws, wys)

        aug = make_device_augment(pad)
        step = make_train_step(model, True, device_augment=aug)
        perm = np.asarray(jax.random.permutation(key, len(x)))
        # the scan shuffles the trigger set per epoch then cycles it, so
        # every trigger trains over epochs even with few steps per epoch
        wm_perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(key, 1), len(wm_x)))
        s_loop = jax.tree.map(jnp.asarray, host)
        for t in range(len(x) // bs):
            idx = perm[t * bs:(t + 1) * bs]
            wm_idx = wm_perm[(t * 2 + np.arange(2)) % len(wm_x)]
            s_loop, _ = step(s_loop, {
                "image": jnp.asarray(x[idx]), "label": jnp.asarray(y[idx]),
                "wm_image": jnp.asarray(wm_x[wm_idx]),
                "wm_label": jnp.asarray(wm_y[wm_idx]),
            })
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_scan.params), jax.device_get(s_loop.params))

    def test_oversized_batch_rejected(self):
        model = tiny_passport_model(private=True)
        x, y = u8_data(n=8)
        epoch_fn = make_epoch_train_fn(model, True, 16, 2)
        state = make_state(model, jnp.zeros((2, 16, 16, 3)))
        xs, ys = device_resident(x, y)
        with pytest.raises(ValueError, match="exceeds"):
            epoch_fn(state, xs, ys, jax.random.key(0))


class TestMeshEpochScan:
    """The scanned epoch composes with a multi-device mesh: resident data
    replicated, per-step gathers constrained to P('batch') — semantics
    identical to the single-chip scan (train/epoch.py docstring)."""

    def test_mesh_scan_matches_single_device(self):
        from deepipr_tpu.parallel import make_mesh, replicate

        model = tiny_passport_model(private=True)
        x, y = u8_data(n=64)
        bs, pad = 16, 2
        state0 = make_state(model, jnp.zeros((2, 16, 16, 3)))
        host = jax.tree.map(np.asarray, state0)
        key = jax.random.key(7)

        s_one = jax.tree.map(jnp.asarray, host)
        fn_one = make_epoch_train_fn(model, True, bs, pad)
        s_one, m_one = fn_one(s_one, *device_resident(x, y), key)

        mesh = make_mesh()  # 8 virtual CPU devices (conftest)
        assert mesh.size == 8
        s_mesh = replicate(jax.tree.map(jnp.asarray, host), mesh)
        fn_mesh = make_epoch_train_fn(model, True, bs, pad, mesh=mesh)
        s_mesh, m_mesh = fn_mesh(
            s_mesh, *device_resident(x, y, mesh=mesh), key)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_mesh.params), jax.device_get(s_one.params))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_mesh.batch_stats),
            jax.device_get(s_one.batch_stats))
        for k in m_one:
            assert float(m_mesh[k]) == pytest.approx(
                float(m_one[k]), rel=1e-4, abs=1e-5), k

    def test_mesh_v3_trigger_padding_weights(self):
        """V3 on a mesh: the trigger batch pads to shard divisibility with
        weight-0 lookahead samples; the cycle still advances by wm_batch per
        step (reference trainer.py:115-126 semantics). Proven against a
        manual per-step loop with explicit indices + weights."""
        from deepipr_tpu.data.device_augment import make_device_augment
        from deepipr_tpu.parallel import make_mesh, replicate
        from deepipr_tpu.train.steps import make_train_step

        model = tiny_passport_model(private=True)
        x, y = u8_data(n=32)
        wm_x, wm_y = u8_data(n=6, seed=5)
        bs, pad, wm_batch = 16, 2, 2
        mesh = make_mesh()
        n_shards = int(mesh.shape["batch"])
        wm_take = -((-wm_batch) // n_shards) * n_shards  # 8 on the 8-mesh
        assert wm_take == 8

        state0 = make_state(model, jnp.zeros((2, 16, 16, 3)))
        host = jax.tree.map(np.asarray, state0)
        key = jax.random.key(3)

        fn_mesh = make_epoch_train_fn(model, True, bs, pad, mesh=mesh,
                                      wm_batch=wm_batch)
        s_mesh = replicate(jax.tree.map(jnp.asarray, host), mesh)
        s_mesh, _ = fn_mesh(
            s_mesh, *device_resident(x, y, mesh=mesh), key,
            *device_resident(wm_x, wm_y, mesh=mesh))

        aug = make_device_augment(pad)
        step = make_train_step(model, True, device_augment=aug)
        perm = np.asarray(jax.random.permutation(key, len(x)))
        wm_perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(key, 1), len(wm_x)))
        weight = np.concatenate([
            np.ones(bs + wm_batch, np.float32),
            np.zeros(wm_take - wm_batch, np.float32),
        ])
        s_loop = jax.tree.map(jnp.asarray, host)
        for t in range(len(x) // bs):
            idx = perm[t * bs:(t + 1) * bs]
            wm_idx = wm_perm[(t * wm_batch + np.arange(wm_take)) % len(wm_x)]
            s_loop, _ = step(s_loop, {
                "image": jnp.asarray(x[idx]), "label": jnp.asarray(y[idx]),
                "wm_image": jnp.asarray(wm_x[wm_idx]),
                "wm_label": jnp.asarray(wm_y[wm_idx]),
                "weight": jnp.asarray(weight),
            })
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_mesh.params), jax.device_get(s_loop.params))

    def test_indivisible_batch_rejected(self):
        from deepipr_tpu.parallel import make_mesh

        model = tiny_passport_model(private=True)
        with pytest.raises(ValueError, match="batch_size"):
            make_epoch_train_fn(model, True, 12, 2, mesh=make_mesh())


class TestPallasInputStage:
    """input_stage='pallas' (fused DMA gather + augment kernel) must train
    identically to the XLA input stage — same RNG draws, bit-identical
    batches (tests/test_pallas_augment.py), same step math."""

    @pytest.mark.parametrize("v3", [False, True])
    def test_pallas_epoch_matches_xla_epoch(self, v3):
        model = tiny_passport_model(private=True)
        x, y = u8_data()
        wm = device_resident(*u8_data(n=6, seed=5)) if v3 else ()
        bs, pad = 16, 2
        state0 = make_state(model, jnp.zeros((2, 16, 16, 3)))
        host = jax.tree.map(np.asarray, state0)
        key = jax.random.key(21)
        xs, ys = device_resident(x, y)

        out = {}
        for stage in ("xla", "pallas"):
            fn = make_epoch_train_fn(model, True, bs, pad, input_stage=stage)
            s = jax.tree.map(jnp.asarray, host)
            s, m = fn(s, xs, ys, key, *wm)
            out[stage] = (s, m)

        s_x, m_x = out["xla"]
        s_p, m_p = out["pallas"]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_p.params), jax.device_get(s_x.params))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            jax.device_get(s_p.batch_stats), jax.device_get(s_x.batch_stats))
        for k in m_x:
            assert float(m_p[k]) == pytest.approx(
                float(m_x[k]), rel=1e-4, abs=1e-5), k

    def test_pallas_rejected_on_mesh(self):
        from deepipr_tpu.parallel import make_mesh

        model = tiny_passport_model(private=True)
        with pytest.raises(ValueError, match="single-device"):
            make_epoch_train_fn(model, True, 16, 2, mesh=make_mesh(),
                                input_stage="pallas")

    def test_pallas_requires_random_crop(self):
        model = tiny_passport_model(private=True)
        with pytest.raises(ValueError, match="random_crop"):
            make_epoch_train_fn(model, True, 16, 2, random_crop=False,
                                input_stage="pallas")
