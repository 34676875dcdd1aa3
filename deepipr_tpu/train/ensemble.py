"""Vmapped ensemble training: N passport models in ONE compiled step.

The DeepIPR deployment story (reference README.md:40-61; TPAMI §5) issues a
DISTINCT passport/signature per licensee of the same architecture. The
reference trains each licensee model in a separate run; here the N member
states are one stacked pytree and a single jit(vmap(train_step)) advances
all of them per batch — a capability that exists because the train step is a
pure function of (state, batch).

Why this is the TPU-shaped answer: a CIFAR-scale CNN leaves the chip
underutilized (the v5e step is HBM-bound with the MXU half idle,
docs/DESIGN.md §11), and XLA compiles the vmapped step into batched
convolutions that recover MXU efficiency lost to small channel counts.
Measured scaling lives in benchmarks/bench_ensemble.py.

Scaling out: the stacked member axis is a real array axis, so it shards over
the mesh's 'model' axis (`shard_ensemble`) while data stays sharded over
'batch' — licensee fleets train data-parallel AND member-parallel with XLA
inserting the collectives.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.passport.codec import SignatureSpec, encode_signature
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import make_train_step


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack N member TrainStates into one ensemble state (leading axis N).

    All members must share the architecture (identical tree structure and
    leaf shapes) and the same optimizer `tx`.
    """
    if not states:
        raise ValueError("need at least one member state")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def member_state(ensemble: TrainState, i: int) -> TrainState:
    """Extract member i as a standalone TrainState (for eval, export,
    checkpointing one licensee's model)."""
    return jax.tree.map(lambda x: x[i], ensemble)


def ensemble_size(ensemble: TrainState) -> int:
    return int(jax.tree.leaves(ensemble.params)[0].shape[0])


def override_signature(
    signature: Dict[str, Any], spec: SignatureSpec, seed: int = 0,
    _prefix: str = "",
) -> Dict[str, Any]:
    """Re-encode every per-layer b in a 'signature' collection with `spec`
    (str -> ASCII bits in the leading channels, int -> constant, None ->
    random signs), mirroring the reference's passport_kwargs['b'] semantics
    (passportconv2d.py:25-41). Used to give each ensemble member its own
    ASCII ownership string. Each layer's rng is seeded from its FULL path so
    same-named layers in different blocks (layer4_0/convbn_2 vs
    layer4_1/convbn_2) keep independent random sign tails."""
    out = {}
    for name, leaf in signature.items():
        path = f"{_prefix}/{name}" if _prefix else name
        if isinstance(leaf, dict) and "b" not in leaf:
            out[name] = override_signature(leaf, spec, seed, _prefix=path)
            continue
        b = leaf["b"]
        digest = hashlib.sha256(f"{seed}:{path}".encode()).digest()
        rng = jax.random.key(int.from_bytes(digest[:4], "little"))
        out[name] = {"b": encode_signature(rng, b.shape[-1], spec)}
    return out


def init_ensemble(
    model,
    tx,
    input_shape,
    n: int,
    seed: int = 0,
    signatures: Optional[Sequence[SignatureSpec]] = None,
) -> TrainState:
    """Initialize N members with independent params/passports/signatures.

    signatures: optional per-member signature spec (e.g. one ASCII string
    per licensee) applied to every passport layer of that member; default
    keeps each member's config/random signature from its own init rng.
    """
    if signatures is not None and len(signatures) != n:
        raise ValueError(f"got {len(signatures)} signatures for {n} members")
    members = []
    for i in range(n):
        base = jax.random.fold_in(jax.random.key(seed), i)
        rngs = {
            "params": jax.random.fold_in(base, 0),
            "passport": jax.random.fold_in(base, 1),
        }
        variables = dict(
            model.init(rngs, jnp.zeros(input_shape, jnp.float32), train=True)
        )
        if signatures is not None:
            if not variables.get("signature"):
                raise ValueError(
                    "signatures given but the model has no passport layers "
                    "(no 'signature' collection) — nothing to embed them in"
                )
            variables["signature"] = override_signature(
                dict(variables["signature"]), signatures[i], seed=seed * n + i
            )
        members.append(TrainState.create(variables, tx))
    return stack_states(members)


def setup_ensemble_passports(
    model,
    ensemble: TrainState,
    pretrained_model,
    pretrained_variables,
    key_x: np.ndarray,
    key_y: Optional[np.ndarray] = None,
    seed: int = 0,
) -> TrainState:
    """Give each member its own passports: the reference's key-setup pass
    (train/keys.py) run per member with a distinct selection seed, so every
    licensee's scale/bias derive from different secret activation shuffles.
    The pretrained tap forwards run ONCE; only the selection differs."""
    from deepipr_tpu.train.keys import collect_taps, passports_from_taps

    n = ensemble_size(ensemble)
    taps_x = collect_taps(pretrained_model, pretrained_variables, key_x)
    taps_y = (
        taps_x
        if key_y is None
        else collect_taps(pretrained_model, pretrained_variables, key_y)
    )
    new = [
        passports_from_taps(
            taps_x,
            taps_y,
            jax.tree.map(lambda x: x[i], ensemble.passport),
            seed=seed * max(n, 1) + i,
        )
        for i in range(n)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new)
    return ensemble.replace(passport=stacked)


def make_ensemble_train_step(
    model,
    private: bool,
    per_member_data: bool = False,
    **step_kwargs,
):
    """jit(vmap(train_step)) over the stacked member axis.

    per_member_data=False feeds every member the same batch (leading batch
    axis shared); True expects batch leaves with a leading member axis
    (e.g. bootstrap resamples or per-licensee data).

    Returns step(ensemble_state, batch) -> (ensemble_state, metrics) with
    every metric a length-N vector.
    """
    step = make_train_step(model, private, jit=False, **step_kwargs)
    vstep = jax.vmap(step, in_axes=(0, 0 if per_member_data else None))
    return jax.jit(vstep, donate_argnums=0)


def make_ensemble_epoch_fn(
    model,
    private: bool,
    batch_size: int,
    pad: int,
    random_crop: bool = True,
    out_dtype=jnp.float32,
):
    """Scanned epochs for the whole fleet: lax.scan over minibatches of a
    device-resident dataset, each step a vmapped member-parallel train step
    (train/epoch.py composed with the ensemble vmap). One dispatch advances
    every member through a full epoch — zero per-step H2D or dispatch.

    All members see the same shuffled data stream and augmentation draws;
    the batch is augmented ONCE per step (keyed off the members' common
    step counter — members stacked by init_ensemble are in lockstep) and
    the plain step vmaps over it, so the fleet pays 1x augmentation, not N.
    Params/passports/signatures stay per-member. V2 scope; V3 trigger
    fleets use the per-step path.
    """
    from deepipr_tpu.data.device_augment import make_device_augment
    from deepipr_tpu.train.epoch import epoch_permutation

    aug = make_device_augment(pad, random_crop=random_crop,
                              out_dtype=out_dtype)
    raw_step = make_train_step(model, private, jit=False)
    vstep = jax.vmap(raw_step, in_axes=(0, None))

    def epoch_fn(ensemble: TrainState, images_u8, labels, epoch_key):
        steps, perm = epoch_permutation(epoch_key, images_u8.shape[0],
                                        batch_size)

        def body(ens, idx):
            # same key derivation as the per-step path's in-step augment
            # (steps.py: fold_in(key(1), state.step)), taken from member 0's
            # counter so the draw matches each member's own
            key = jax.random.fold_in(jax.random.key(1), ens.step[0])
            x = aug(key, images_u8[idx])
            return vstep(ens, {"image": x, "label": labels[idx]})

        ensemble, metrics = jax.lax.scan(body, ensemble, perm)
        # mean over steps, keep the member axis: {metric: (N,)}
        return ensemble, jax.tree.map(lambda a: a.mean(axis=0), metrics)

    return jax.jit(epoch_fn, donate_argnums=0)


def make_ensemble_signature_fn(model, input_shape, private: bool):
    """Vmapped signature detection: {layer: length-N bit-accuracy vector}."""
    from deepipr_tpu.passport.codec import bit_accuracy
    from deepipr_tpu.train.steps import collect_aux_with_paths

    kwargs = {"ind": 1} if private else {"force_passport": True}

    def one(state: TrainState):
        _, upd = model.apply(
            state.model_variables(),
            jnp.zeros(input_shape, jnp.float32),
            train=False,
            mutable=["passport_aux", "batch_stats"],
            **kwargs,
        )
        return {
            path: bit_accuracy(aux["scale"], aux["b"])
            for path, aux in collect_aux_with_paths(upd)
        }

    run = jax.jit(jax.vmap(one))

    def fn(ensemble: TrainState):
        return {k: np.asarray(v) for k, v in run(ensemble).items()}

    return fn


def shard_ensemble(ensemble: TrainState, mesh, axis_name: str = "model"):
    """Lay the stacked member axis over a mesh axis.

    Every array leaf's leading dim is the member count, so each member's
    whole state lives on one mesh slice; the vmapped step then runs
    member-parallel with zero cross-member communication, while the batch
    axis of the data shards over 'batch' as usual.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis_name))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, ensemble)
