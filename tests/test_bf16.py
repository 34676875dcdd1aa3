"""bf16 training signature integrity.

The hardware bench trains in bfloat16 (activations/matmuls on the MXU fast
path) while the passport scale/bias derivation is forced to f32
(passport/derive.py) — so signature sign-exactness is supposed to survive
bf16 training. These tests turn that assertion into evidence:

1. a V2 model trained in bf16 reaches 100% signature decode,
2. its derived scale SIGNS agree exactly with an f32 twin run (same data,
   same init seeds, same step count),
3. a bf16-trained checkpoint exports through the torch interop and the
   ACTUAL reference code (/root/reference) decodes the same signature
   sign-exactly (reference decode metric: trainer_private.py:49-64).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.models import AlexNet
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer
from deepipr_tpu.train.steps import test_signature as signature_detection
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}
REFERENCE = "/root/reference"


def _train_tiny_v2(dtype, steps=40):
    """Train the tiny private AlexNet for `steps` steps; identical data and
    init seeds regardless of dtype, so runs differ ONLY in compute dtype."""
    cfg = {"0": False, "2": False, "4": "hi", "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True,
                    dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16).astype(np.int32))
    batch = {"image": x, "label": y}
    variables = model.init(RNGS, x, train=True)
    state = TrainState.create(variables, sgd_optimizer(0.05))
    step = make_train_step(model, private=True)
    for _ in range(steps):
        state, metrics = step(state, batch)
    return model, state, metrics


@pytest.fixture(scope="module")
def bf16_run():
    return _train_tiny_v2(jnp.bfloat16)


class TestBf16SignatureIntegrity:
    def test_bf16_reaches_full_signature_decode(self, bf16_run):
        model, state, metrics = bf16_run
        assert float(metrics["sign_acc"]) == 1.0
        res = signature_detection(model, state, (1, 32, 32, 3), private=True)
        assert res and all(v == 1.0 for v in res.values()), res

    def test_bf16_signs_agree_with_f32_twin(self, bf16_run):
        model_b, state_b, _ = bf16_run
        model_f, state_f, _ = _train_tiny_v2(None)  # f32 twin, same seeds
        aff_b = derived_affines(model_b, state_b.model_variables(),
                                (1, 32, 32, 3), private=True)
        aff_f = derived_affines(model_f, state_f.model_variables(),
                                (1, 32, 32, 3), private=True)
        assert set(aff_b) == set(aff_f) and len(aff_b) == 3
        for path in aff_b:
            sb = np.sign(np.asarray(aff_b[path]["scale"], np.float32)).ravel()
            sf = np.sign(np.asarray(aff_f[path]["scale"], np.float32)).ravel()
            np.testing.assert_array_equal(sb, sf, err_msg=path)
            # and both equal the embedded signature
            b = np.asarray(aff_b[path]["b"], np.float32).ravel()
            np.testing.assert_array_equal(sb, np.sign(b), err_msg=path)

    @pytest.mark.slow
    def test_bf16_checkpoint_exports_sign_exact_to_reference(self, bf16_run):
        """The reference's own get_scale decodes a bf16-trained checkpoint
        with exact sign agreement (export path casts to f32 torch tensors)."""
        torch = pytest.importorskip("torch")
        from test_reference_parity import _ref_layer_kwargs, _stub_torchvision

        from deepipr_tpu.interop.torch_export import export_torch_state_dict

        model, state, _ = bf16_run
        variables = state.model_variables()
        sd = export_torch_state_dict(model, variables)

        _stub_torchvision()
        sys.path.insert(0, REFERENCE)
        try:
            import models.alexnet_passport_private as ref_private

            ref_kwargs = {
                "0": _ref_layer_kwargs(False), "2": _ref_layer_kwargs(False),
                "4": _ref_layer_kwargs(True, b="hi"),
                "5": _ref_layer_kwargs(True), "6": _ref_layer_kwargs(True),
            }
            tmodel = ref_private.AlexNetPassportPrivate(3, 10, ref_kwargs)
            missing, unexpected = tmodel.load_state_dict(sd, strict=True)
            assert not missing and not unexpected
            tmodel.eval()

            ours = derived_affines(model, variables, (1, 32, 32, 3),
                                   private=True)
            n_checked = 0
            for name, mod in tmodel.named_modules():
                if type(mod).__name__ == "PassportPrivateBlock":
                    path = f"features_{name.split('.')[-1]}"
                    with torch.no_grad():
                        t_scale = mod.get_scale(True).flatten().numpy()
                    j_scale = np.asarray(ours[path]["scale"],
                                         np.float32).ravel()
                    np.testing.assert_array_equal(
                        np.sign(t_scale), np.sign(j_scale), err_msg=path)
                    np.testing.assert_array_equal(
                        mod.b.numpy(),
                        np.asarray(variables["signature"][path]["b"]))
                    n_checked += 1
            assert n_checked == 3
        finally:
            sys.path.remove(REFERENCE)
