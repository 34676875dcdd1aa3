"""Passport pre-commitment (passport/commitment.py): binds the ownership
secrets to a digest the owner can timestamp before release — the mitigation
for post-hoc forgery (attacks/forge.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.models import AlexNet
from deepipr_tpu.passport.commitment import commit, verify_commitment
from deepipr_tpu.train import TrainState, sgd_optimizer
from deepipr_tpu.utils.config import construct_passport_kwargs

SHAPE = (1, 16, 16, 3)


@pytest.fixture(scope="module")
def model_state():
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    v = model.init({"params": jax.random.key(0), "passport": jax.random.key(1)},
                   jnp.zeros(SHAPE), train=True)
    return model, TrainState.create(v, sgd_optimizer(0.01))


def test_commit_is_deterministic(model_state):
    model, state = model_state
    a = commit(state, model=model, input_shape=SHAPE)
    b = commit(state, model=model, input_shape=SHAPE)
    assert a == b
    assert len(a["commitment"]) == 64


def test_verify_roundtrip_and_forgery_detection(model_state):
    model, state = model_state
    rec = commit(state, model=model, input_shape=SHAPE)
    assert verify_commitment(state, rec, model=model, input_shape=SHAPE)

    # a different passport set (a forger's) fails the commitment
    other = jax.tree.map(lambda x: x + 0.01, state.passport)
    forged = state.replace(passport=other)
    assert not verify_commitment(forged, rec, model=model, input_shape=SHAPE)

    # a tampered record fails
    bad = dict(rec)
    bad["passport_sha256"] = "0" * 64
    assert not verify_commitment(state, bad, model=model, input_shape=SHAPE)


def test_commit_without_weights_binding(model_state):
    model, state = model_state
    rec = commit(state)  # passports+signatures only
    assert "derived_signs_sha256" not in rec
    assert verify_commitment(state, rec)
    # verification ignores the model when the record carries no binding
    assert verify_commitment(state, rec, model=model, input_shape=SHAPE)


def test_meta_is_bound(model_state):
    _, state = model_state
    rec = commit(state, meta={"owner": "ACME", "date": "2026-08-17"})
    assert verify_commitment(state, rec)
    tampered = dict(rec)
    tampered["meta"] = {"owner": "EVE", "date": "2026-08-17"}
    assert not verify_commitment(state, tampered)
