"""Passport key setup: turn candidate images into per-layer passports.

Reference flow (passport_generator.py, classification.py:130-140,
alexnet_passport.py:104-112, resnet_passport.py:32-65): sample n images
(20 for 'shuffle', 1 for 'image'), propagate them through a PRETRAINED normal
model, and for each passport layer snapshot the activation maps entering that
layer; 'shuffle' then draws each passport channel from a random (image,
channel) pair.

TPU-native design: instead of a host-side layer-by-layer walk, the pretrained
model is applied ONCE with the 'taps' collection mutable — every block sows its
input activation — then passports are assembled host-side from the taps. The
module paths of the normal and passport models match by construction, so taps
align with passport variables.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Optional

import jax
import numpy as np

from deepipr_tpu.passport.selection import passport_selection


def sample_candidates(images: np.ndarray, n: int, seed: int) -> np.ndarray:
    """Sample n images without replacement (reference get_key,
    passport_generator.py:6-17)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(images.shape[0], size=n, replace=False)
    return np.asarray(images[idx])


def collect_taps(model, variables, x) -> Dict[str, Any]:
    """Run the model once, returning {module_path: input activation}.

    Runs in train mode: the reference never puts the pretrained model in eval
    mode during set_intermediate_keys, so BN normalizes with the candidate
    batch's own statistics. Stat updates are discarded.
    """
    _, upd = model.apply(
        dict(variables), x, train=True,
        mutable=["taps", "batch_stats", "passport_aux"],
    )
    taps = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "inp" in node:
                taps["/".join(path)] = np.asarray(node["inp"][0])
            else:
                for k, v in node.items():
                    walk(v, path + [k])

    walk(upd.get("taps", {}), [])
    return taps


def get_intermediate_activation(model, variables, x, layer_path: str) -> np.ndarray:
    """Input activation entering one named layer (reference
    get_intermediate_key, passport_generator.py:20-27 — there a hook on a
    single module; here a one-shot taps pass filtered to the path)."""
    taps = collect_taps(model, variables, x)
    if layer_path not in taps:
        raise KeyError(f"no tap for layer {layer_path}; available: {sorted(taps)}")
    return taps[layer_path]


def _layer_seed(base_seed: int, path: str, which: str) -> int:
    h = hashlib.sha256(f"{base_seed}:{path}:{which}".encode()).digest()
    return int.from_bytes(h[:4], "little")


def setup_passports(
    pretrained_model,
    pretrained_variables,
    target_passport: Dict[str, Any],
    key_x: np.ndarray,
    key_y: Optional[np.ndarray],
    seed: int = 0,
) -> Dict[str, Any]:
    """Build a new 'passport' collection for the target model.

    key_x feeds the bias passports ('key'), key_y the scale passports ('skey'),
    matching the reference's set_key(x, y) argument order
    (passportconv2d.py:125-137: key<-x, skey<-y).
    """
    taps_x = collect_taps(pretrained_model, pretrained_variables, key_x)
    taps_y = (
        taps_x
        if key_y is None
        else collect_taps(pretrained_model, pretrained_variables, key_y)
    )
    return passports_from_taps(taps_x, taps_y, target_passport, seed=seed)


def passports_from_taps(
    taps_x: Dict[str, Any],
    taps_y: Dict[str, Any],
    target_passport: Dict[str, Any],
    seed: int = 0,
) -> Dict[str, Any]:
    """setup_passports from precomputed taps — lets callers that build many
    passport sets from the SAME pretrained activations (the licensee
    ensemble, train/ensemble.py) run the tap forwards once."""

    def rebuild(node, path):
        if isinstance(node, dict) and "key" in node and "skey" in node:
            tap_path = "/".join(path)
            if tap_path not in taps_x:
                raise KeyError(
                    f"no tap for passport layer {tap_path}; "
                    f"available: {sorted(taps_x)}"
                )
            cand_x = taps_x[tap_path]
            cand_y = taps_y[tap_path]
            new_key = (
                cand_x
                if cand_x.shape[0] == 1
                else passport_selection(cand_x, _layer_seed(seed, tap_path, "key"))
            )
            new_skey = (
                cand_y
                if cand_y.shape[0] == 1
                else passport_selection(cand_y, _layer_seed(seed, tap_path, "skey"))
            )
            return {
                "key": jax.numpy.asarray(new_key, dtype=np.float32),
                "skey": jax.numpy.asarray(new_skey, dtype=np.float32),
            }
        if isinstance(node, dict):
            return {k: rebuild(v, path + [k]) for k, v in node.items()}
        return node

    return rebuild(dict(target_passport), [])
