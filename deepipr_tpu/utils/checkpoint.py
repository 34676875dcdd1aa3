"""Checkpointing: full-train-state serialization.

Unlike the reference (weights-only .pth, no optimizer/scheduler/epoch state —
experiments/base.py:139-150, so true resume does not exist), checkpoints here
carry the complete TrainState: params, BN stats, passports, signatures,
optimizer state, and step counter.
"""

from __future__ import annotations

import os
import threading
from typing import Any

import flax.serialization
import jax


def save_state(path: str, state: Any) -> None:
    """Atomic write: serialize to path.tmp, fsync, rename — a crash mid-save
    never corrupts the previous checkpoint."""
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    host_state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(host_state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Overlap checkpoint D2H + disk write with the next epoch's compute.

    On a relay-attached chip fetching the full train state costs seconds —
    with best+last saved every epoch that dominated short epochs. save()
    snapshots the state ON DEVICE (cheap copy, safe against the train step's
    buffer donation) and hands the fetch+write to a single worker thread.
    The queue is BOUNDED (a few snapshots): a producer faster than the
    writer blocks instead of piling full-state device copies into memory.
    Call flush() before reading checkpoints back or exiting.
    """

    def __init__(self, max_pending: int = 3):
        import queue

        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._error = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            path, snap = self._q.get()
            try:
                save_state(path, snap)
            except BaseException as e:  # surfaced on the next flush()
                self._error = e
            finally:
                self._q.task_done()

    def save(self, path: str, state: Any) -> None:
        snap = jax.tree.map(
            lambda x: x.copy() if hasattr(x, "copy") else x, state)
        self._q.put((path, snap))

    def flush(self) -> None:
        """Block until all queued saves hit disk; re-raise any save error."""
        self._q.join()
        if self._error is not None:
            e, self._error = self._error, None
            raise e


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
    dropped = []

    def diff(ck, tmpl, prefix):
        if isinstance(ck, dict):
            tk = tmpl if isinstance(tmpl, dict) else {}
            for k, v in ck.items():
                if k not in tk:
                    dropped.append(f"{prefix}/{k}")
                else:
                    diff(v, tk[k], f"{prefix}/{k}")

    for k, v in sd.items():
        diff(v, flax.serialization.to_state_dict(getattr(template, k)), k)
    if dropped:
        # flax.from_state_dict silently ignores checkpoint keys absent from
        # the template — that silence cost a whole attack grid once (a
        # separate-stats checkpoint evaluated with shared-stats BN), so
        # surface it loudly
        print(f"WARNING: load_state dropped {len(dropped)} checkpoint "
              f"entr{'y' if len(dropped) == 1 else 'ies'} not in the "
              f"template: {dropped[:6]}{' ...' if len(dropped) > 6 else ''}")
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
