"""Shared attack machinery: derived affines, global sign flips, eval helpers."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from deepipr_tpu.passport.codec import bit_accuracy
from deepipr_tpu.train.steps import collect_aux_with_paths


def plkey_to_module_path(plkey: str) -> str:
    """Translate a passport-config key into the flax module path.

    '4' (alexnet feature index)        -> 'features_4'
    'layer4.0.convbnrelu_1' (resnet)   -> 'layer4_0/convbnrelu_1'
    'convbnrelu_1' (resnet stem)       -> 'convbnrelu_1'
    """
    parts = plkey.split(".")
    if len(parts) == 1:
        return f"features_{plkey}" if plkey.isdigit() else plkey
    layer, idx, module = parts
    return f"{layer}_{idx}/{module}"


def derived_affines(model, variables, input_shape, private: bool) -> Dict[str, Dict]:
    """{module_path: {'scale','bias','b','alpha'}} derived from the passports.

    One apply with the passport branch forced; reads the sown aux
    (the reference calls get_scale()/get_bias() per layer —
    experiments/utils.py:201-202).
    """
    kwargs = {"ind": 1} if private else {"force_passport": True}
    x = jnp.zeros(input_shape, jnp.float32)
    _, upd = model.apply(
        dict(variables), x, train=False,
        mutable=["passport_aux", "batch_stats"], **kwargs,
    )
    return dict(collect_aux_with_paths(upd))


def global_sign_flip(
    vectors: List[np.ndarray], perc: float, seed: int, to_unit_signs: bool = False
) -> Tuple[List[np.ndarray], float]:
    """Flip the sign of perc fraction of entries, chosen globally across all
    vectors (reference flip_attack.py:137-161 / passport_attack_2.py:261-287).

    to_unit_signs=True reproduces attack 2's quirk of REPLACING values with
    +-1 signs before flipping (passport_attack_2.py:273-281); False keeps
    magnitudes and only flips signs (flip attack).
    """
    sizes = [int(v.size) for v in vectors]
    total = sum(sizes)
    rng = np.random.default_rng(seed)
    idxs = rng.permutation(total)[: int(total * perc)]

    out, sims = [], []
    for v, size in zip(vectors, sizes):
        w = np.sign(v.copy()) if to_unit_signs else v.copy()
        local = idxs[idxs < size]
        orig_sign = np.sign(w)
        w[local] *= -1
        sims.append(float(np.mean(np.sign(w) == orig_sign)))
        out.append(w)
        idxs = idxs[idxs >= size] - size
    similarity = float(np.mean(sims)) if sims else 1.0
    return out, similarity


def detect_signature_from_affines(affines: Dict[str, Dict]) -> Dict[str, float]:
    """{layer: detection rate} using derived scales (reference
    pruning_attack.py:20-31: sign(get_scale(True)) vs b)."""
    return {
        path: float(bit_accuracy(aux["scale"], aux["b"]))
        for path, aux in affines.items()
    }
