"""Sign-flipping attack (reference flip_attack.py).

For p in {0,...,100}%: materialize each passport layer's DERIVED scale/bias
into explicit affine parameters, flip the sign of p% of the scale entries
(chosen globally across passport layers), and measure validation accuracy with
the flipped affine plus the signature detection rate — which stays at the
passport-derived value, since detection always reads sign(get_scale(True))
from the untouched passports (flip_attack.py:19-31).

Implementation: the flipped scale/bias are injected through the model's
public-affine path — for private models they overwrite the learned public
scale/bias (params); for V1 models the model is rebuilt with
learnable_affine=True so explicit scale/bias parameters exist (the
reference's init_scale(True)).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from deepipr_tpu.attacks.common import (
    derived_affines,
    detect_signature_from_affines,
    global_sign_flip,
)
from deepipr_tpu.train.steps import make_eval_step, run_eval
from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths


def materialize_affines(params: Dict, affines: Dict[str, Dict],
                        plpaths: List[str]) -> Dict:
    """Write derived scale/bias into the explicit affine params of each
    passport layer (reference init_scale(True) + copy, flip_attack.py:99-127)."""
    flat = dict(flatten_paths(params))
    for path in plpaths:
        flat[f"{path}/scale"] = affines[path]["scale"].reshape(-1)
        flat[f"{path}/bias"] = affines[path]["bias"].reshape(-1)
    return unflatten_paths(flat)


def align_stats_with_private(batch_stats: Dict, plpaths: List[str]) -> Dict:
    """For separate-stats checkpoints, copy bn_private running stats over the
    public bn stats at the passport layers.

    The materialized-affine eval runs the PUBLIC forward with the
    PRIVATE-derived scale/bias (reference flip_attack semantics — fine under
    the reference's shared BN). With per-branch stats (our beyond-reference
    variant, models/layers.py:292-301) those affines belong with bn_private's
    statistics; pairing them with the public stats evaluates a model nobody
    trained (observed: 9.8% acc at 0% flips on the 200-epoch checkpoint)."""
    flat = dict(flatten_paths(batch_stats))
    for path in plpaths:
        for stat in ("mean", "var"):
            priv = f"{path}/bn_private/{stat}"
            if priv in flat:
                flat[f"{path}/bn/{stat}"] = flat[priv]
    return unflatten_paths(flat)


def flip_attack(
    model,
    state,
    valid_data,
    input_shape,
    private: bool,
    plpaths: List[str],
    percents=(0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100),
    seed: int = 0,
    flip_paths: List[str] = None,
    wm_data=None,
) -> List[Dict]:
    """Sweep flip levels; one history row per level.

    flip_paths (reference --fidxs) restricts flipping to specific layers;
    default: all passport layers.

    wm_data (V3): trigger-set loader — rows gain black-box WM accuracy of
    the flipped model (reference trainer.py:115-126 verification surface).
    """
    affines = derived_affines(model, state.model_variables(), input_shape, private)
    detection = detect_signature_from_affines(affines)
    base_params = materialize_affines(state.params, affines, plpaths)
    state = state.replace(
        batch_stats=align_stats_with_private(state.batch_stats, plpaths))
    targets = flip_paths or plpaths

    # public/materialized-affine forward (reference model(d) after init_scale)
    eval_step = make_eval_step(model, ind=0, force_passport=False)

    history = []
    for perc in percents:
        scales = [np.asarray(affines[p]["scale"]).reshape(-1).copy()
                  for p in targets]
        flipped, similarity = global_sign_flip(
            scales, perc / 100.0, seed=seed + perc
        )
        flat = dict(flatten_paths(base_params))
        for path, w in zip(targets, flipped):
            flat[f"{path}/scale"] = w
        pstate = state.replace(params=unflatten_paths(flat))

        row: Dict = {f"detect_{k}": v for k, v in detection.items()}
        row["detect_mean"] = float(np.mean(list(detection.values())))
        row["similarity"] = similarity
        row.update(run_eval(eval_step, pstate, valid_data))
        if wm_data is not None:
            row["wm_acc"] = run_eval(eval_step, pstate, wm_data)["acc"]
        row["perc"] = perc
        history.append(row)
    return history
