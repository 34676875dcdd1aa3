"""Passport pre-commitment: the cryptographic answer to post-hoc forgery.

The forgery measurements (attacks/forge.py) show a data-equipped white-box
attacker can optimize passports that BOTH carry their chosen signature and
recover accuracy — at that point sign-accuracy and accuracy-collapse checks
cannot distinguish owner from forger. What does distinguish them is TIME:
the owner can commit to their passports/signature when training finishes,
before the model is ever distributed; a forger can only produce theirs
after obtaining the model.

commit() canonicalizes the secret collections (passports + signatures +
the derived scales they produce) and returns a SHA-256 digest. Publishing
the digest (timestamping service, VCS, blockchain, a lawyer's envelope)
proves possession at that date without revealing the secrets; a dispute is
settled by revealing the passports and checking them against the earliest
registered digest. This is standard hash-commitment practice applied to the
DeepIPR dispute-resolution workflow (docs/VERIFICATION.md §6).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, Optional

import jax
import numpy as np


def _canonical_bytes(tree: Any) -> bytes:
    """Deterministic byte serialization of a pytree of arrays: sorted paths,
    dtype+shape headers, raw little-endian data."""
    h = hashlib.sha256()
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    entries = []
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        a = np.asarray(jax.device_get(leaf))
        entries.append((key, a))
    for key, a in sorted(entries, key=lambda e: e[0]):
        h.update(key.encode())
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a.astype(np.float64)).tobytes())
    return h.digest()


def commit(state, model=None, input_shape=None, private: bool = True,
           meta: Optional[Dict] = None) -> Dict:
    """Commitment record for a trained state's ownership secrets.

    Binds passports + signatures; when model/input_shape are given it also
    binds the derived scales (so the commitment covers the weights'
    interaction with the passports, not just the passport bytes).
    """
    record = {
        "scheme": "deepipr-passport-commitment-v1",
        "passport_sha256": _canonical_bytes(state.passport).hex(),
        "signature_sha256": _canonical_bytes(state.signature).hex(),
    }
    if model is not None and input_shape is not None:
        from deepipr_tpu.attacks.common import derived_affines

        affs = derived_affines(
            model, state.model_variables(), input_shape, private)
        scales = {p: np.sign(np.asarray(a["scale"])) for p, a in affs.items()}
        record["derived_signs_sha256"] = _canonical_bytes(scales).hex()
    if meta:
        record["meta"] = dict(meta)
    record["commitment"] = hashlib.sha256(
        json.dumps(record, sort_keys=True).encode()).hexdigest()
    return record


def verify_commitment(state, record: Dict, model=None, input_shape=None,
                      private: bool = True) -> bool:
    """Recompute the commitment from a revealed state and compare."""
    if "derived_signs_sha256" not in record:
        model = input_shape = None  # committed without the weights binding
    fresh = commit(state, model=model, input_shape=input_shape,
                   private=private, meta=record.get("meta"))
    want = {k: v for k, v in record.items() if k != "commitment"}
    got = {k: v for k, v in fresh.items() if k != "commitment"}
    return want == got and record.get("commitment") == fresh["commitment"]
