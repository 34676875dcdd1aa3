"""Branch-point discovery for the split dual-forward V2/V3 train step.

The public (ind=0) and private (ind=1) forwards of a private passport model
are IDENTICAL until the first passport-flagged block: every earlier block has
the same parameters and, in train mode, normalizes with the same batch
statistics. The reference runs the whole network twice per step
(experiments/trainer_private.py:159-166); computing the shared prefix once
and forking at the first passport block saves its FLOPs and HBM traffic
entirely (for the flagship resnet18 config, passports live only in layer4 —
roughly 3/4 of the network is prefix).

branch_point(model) returns (first passport unit name, [prefix unit names])
or None when splitting buys nothing (no passports / first unit flagged).
The train step re-applies the BN running-stat EMA once more for prefix units
(steps.py) so checkpoint statistics match the reference's two-forward update
exactly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from deepipr_tpu.models.alexnet import _CIFAR_CONVS, AlexNet
from deepipr_tpu.models.resnet import ResNet


def _flagged(layer_kwargs) -> bool:
    return bool(layer_kwargs and layer_kwargs.get("flag"))


def branch_point(model) -> Optional[Tuple[str, List[str]]]:
    """(fork unit name, prefix unit names) or None if not splittable."""
    pk = getattr(model, "passport_kwargs", None)
    if pk is None:
        return None
    if isinstance(model, AlexNet):
        units = [
            (f"features_{idx}", _flagged(pk.get(idx)))
            for idx, *_ in _CIFAR_CONVS  # same layer indices for imagenet
        ]
    elif isinstance(model, ResNet):
        units = [("convbnrelu_1", _flagged(pk.get("convbnrelu_1")))]
        for li, n in enumerate(model.num_blocks, start=1):
            layer_pk = pk.get(f"layer{li}") or {}
            for bi in range(n):
                sub = layer_pk.get(str(bi)) or {}
                units.append((
                    f"layer{li}_{bi}",
                    any(_flagged(v) for v in sub.values()),
                ))
    else:
        return None

    prefix: List[str] = []
    for name, flagged in units:
        if flagged:
            return (name, prefix) if prefix else None
        prefix.append(name)
    return None  # no passport units at all
