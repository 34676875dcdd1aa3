"""Checkpointing: full-train-state serialization.

Unlike the reference (weights-only .pth, no optimizer/scheduler/epoch state —
experiments/base.py:139-150, so true resume does not exist), checkpoints here
carry the complete TrainState: params, BN stats, passports, signatures,
optimizer state, and step counter.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax


def save_state(path: str, state: Any) -> None:
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    host_state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host_state))


def load_state(path: str, template: Any, restore_opt: bool = True) -> Any:
    """Restore into a template with identical tree structure (e.g. a freshly
    created TrainState).

    restore_opt=False skips the checkpoint's optimizer state and step counter,
    keeping the template's — the "load pretrained weights" semantics the
    attack CLIs and TL/fine-tune paths need. The optax state tree depends on
    the LR *schedule* the optimizer was built with (a scheduled optimizer
    carries a count, a constant-LR one doesn't), so restoring a scheduled
    checkpoint into a constant-LR template (or vice versa) is a structure
    mismatch unless opt_state is skipped.
    """
    with open(path, "rb") as f:
        data = f.read()
    if restore_opt:
        return flax.serialization.from_bytes(template, data)
    sd = flax.serialization.msgpack_restore(data)
    sd.pop("opt_state", None)
    sd.pop("step", None)
    restored = {
        k: flax.serialization.from_state_dict(getattr(template, k), v, name=k)
        for k, v in sd.items()
    }
    return template.replace(**restored)


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, sharding-aware — for multi-host meshes the
# msgpack path would funnel every shard through one host; Orbax writes
# per-shard. Single-host flows default to the msgpack format above.
# ---------------------------------------------------------------------------

def save_state_orbax(directory: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(directory), jax.device_get(state))


def load_state_orbax(directory: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(directory), template)
