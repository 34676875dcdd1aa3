"""Model surgery: move weights between normal and passport variants.

Re-designs the reference's state-dict surgery helpers
(experiments/utils.py:100-239) on flax variable trees. Works because normal
and passport models share module names by construction (conv kernels at
<block>/conv/kernel, norms at <block>/bn).

- passport -> normal: copy weights; materialize each passport layer's DERIVED
  scale/bias into the normal model's affine norm (utils.py:191-239).
- normal -> passport(learnable affine): copy weights; copy the normal model's
  norm affine into the passport layer's learnable scale/bias (utils.py:100-162).
- normal -> normal: plain weight copy minus the final classifier when
  requested (utils.py:165-188).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths


def _last_classifier_module(paths) -> Optional[str]:
    """The FINAL classifier module name ('classifier', 'classifier_6', 'linear'):
    the reference resets/skips only the last layer (classification.py:181-190)."""
    mods = sorted({p.split("/")[0] for p in paths
                   if p.startswith(("classifier", "linear"))})
    return mods[-1] if mods else None


def copy_matching(src_params: Dict, dst_params: Dict,
                  skip_last_classifier: bool = False) -> Dict:
    """Copy leaves whose path+shape exist in both trees; dst keeps the rest."""
    src = flatten_paths(src_params)
    dst = dict(flatten_paths(dst_params))
    last_cls = _last_classifier_module(dst) if skip_last_classifier else None
    for path, v in src.items():
        if last_cls is not None and path.split("/")[0] == last_cls:
            continue
        if path in dst and jnp.shape(dst[path]) == jnp.shape(v):
            dst[path] = v
    return unflatten_paths(dst)


def passport_to_normal(
    passport_params: Dict,
    passport_stats: Dict,
    derived: Dict[str, Dict],
    normal_params: Dict,
    normal_stats: Dict,
    plpaths: List[str],
):
    """Build (params, batch_stats) for a normal model from a passport model.

    `derived` maps module path -> {'scale','bias'} (attacks/common.derived_affines).
    """
    new_params = copy_matching(passport_params, normal_params)
    flat = dict(flatten_paths(new_params))
    for path in plpaths:
        aux = derived[path]
        flat[f"{path}/bn/scale"] = aux["scale"].reshape(-1)
        flat[f"{path}/bn/bias"] = aux["bias"].reshape(-1)
    new_params = unflatten_paths(flat)
    new_stats = copy_matching(passport_stats, normal_stats)
    # separate-stats checkpoints: the derived affines were trained against
    # bn_private's running stats — pair them (copy_matching only sees the
    # shared 'bn' path, which holds the PUBLIC branch's stats)
    sflat = dict(flatten_paths(new_stats))
    pflat = dict(flatten_paths(passport_stats))
    for path in plpaths:
        for stat in ("mean", "var"):
            priv = f"{path}/bn_private/{stat}"
            if priv in pflat:
                sflat[f"{path}/bn/{stat}"] = pflat[priv]
    new_stats = unflatten_paths(sflat)
    return new_params, new_stats


def normal_to_passport(
    normal_params: Dict,
    normal_stats: Dict,
    passport_params: Dict,
    passport_stats: Dict,
    plpaths: List[str],
):
    """Build (params, batch_stats) for a passport model (with learnable affine)
    from a normal model: norm affine -> learnable scale/bias."""
    new_params = copy_matching(normal_params, passport_params)
    flat = dict(flatten_paths(new_params))
    nflat = flatten_paths(normal_params)
    for path in plpaths:
        if f"{path}/scale" in flat and f"{path}/bn/scale" in nflat:
            flat[f"{path}/scale"] = nflat[f"{path}/bn/scale"]
            flat[f"{path}/bias"] = nflat[f"{path}/bn/bias"]
    new_params = unflatten_paths(flat)
    new_stats = copy_matching(normal_stats, passport_stats)
    return new_params, new_stats


def normal_to_normal(
    src_params: Dict,
    src_stats: Dict,
    dst_params: Dict,
    dst_stats: Dict,
    skip_last_classifier: bool = True,
):
    """Weight copy between normal models (optionally keep dst's classifier —
    used when the class count differs in transfer learning)."""
    return (
        copy_matching(src_params, dst_params,
                      skip_last_classifier=skip_last_classifier),
        copy_matching(src_stats, dst_stats),
    )
