"""Export our variables to the reference's PyTorch state-dict layout.

The inverse of interop/torch_import.py: a checkpoint trained HERE becomes a
state dict the actual kamwoh/DeepIPR code loads with strict=True — so a
reference user can verify ownership of our models inside their own stack
(their TesterPrivate.test_signature, their attack scripts).

Layout produced (verified against real reference state dicts,
models/layers/passportconv2d_private.py / passportconv2d.py):

  params/<mod>/conv/kernel (H,W,I,O) -> <mod>.conv.weight (O,I,H,W)
                                        [+ <mod>.weight alias on passport
                                         blocks — the reference registers
                                         self.weight = self.conv.weight]
  params/<mod>/bn/scale|bias         -> <mod>.bn.weight|bias
  batch_stats/<mod>/bn/mean|var      -> <mod>.bn.running_mean|running_var
                                        (+ num_batches_tracked int64 0)
  params/<mod>/scale|bias            -> <mod>.scale|bias (learned affine)
  passport/<mod>/key|skey (1,H,W,C)  -> <mod>.key[_private]|skey[_private]
                                        (1,C,H,W); _private iff model.private
  signature/<mod>/b                  -> <mod>.b AND <mod>.sign_loss[_private].b
  params/linear|classifier*/kernel   -> .weight (O,I); flattened-conv linears
                                        get their columns re-ordered HWC->CHW

Scope: AlexNet/ResNet models, CIFAR and ImageNet stems (for the latter the
reference wraps the ResNet stem in an nn.Sequential with the maxpool, so
'convbnrelu_1/*' exports as 'convbnrelu_1.0.*' — resnet_passport_private.py:
96-99). separate_stats models cannot be exported (the reference has no
per-branch BN buffers).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from deepipr_tpu.interop.torch_import import _FLATTENED_LINEAR_SHAPES
from deepipr_tpu.utils.tree import flatten_paths


def _torch_mod(path: str) -> str:
    """'features_4' -> 'features.4'; 'layer1_0/convbn_2' -> 'layer1.0.convbn_2';
    'classifier_1' -> 'classifier.1'."""
    parts = []
    for seg in path.split("/"):
        head, _, idx = seg.rpartition("_")
        if head in ("features", "classifier") or (
            head.startswith("layer") and head[5:].isdigit()
        ):
            parts.append(f"{head}.{idx}")
        else:
            parts.append(seg)
    return ".".join(parts)


def _hwc_to_chw_columns(w: np.ndarray, chw) -> np.ndarray:
    """(out, H*W*C) torch-Linear weight -> (out, C*H*W) column order."""
    c, h, wd = chw
    return w.reshape(w.shape[0], h, wd, c).transpose(0, 3, 1, 2).reshape(
        w.shape[0], -1
    )


def export_torch_state_dict(model, variables: Dict) -> Dict[str, Any]:
    """Our variables -> a reference-layout state dict of torch tensors."""
    import torch

    params = dict(flatten_paths(variables["params"]))
    stats = dict(flatten_paths(dict(variables.get("batch_stats", {}))))
    passports = dict(flatten_paths(dict(variables.get("passport", {}))))
    signatures = dict(flatten_paths(dict(variables.get("signature", {}))))

    if any(p.split("/")[-2] == "bn_private" for p in stats):
        raise ValueError(
            "separate_stats models cannot be exported: the reference has no "
            "per-branch BN buffers (one shared affine-free norm, "
            "passportconv2d_private.py:56-64)"
        )
    private = bool(getattr(model, "private", False))
    key_suffix = "_private" if private else ""
    sign_loss_name = "sign_loss_private" if private else "sign_loss"
    passport_mods = {p.rsplit("/", 1)[0] for p in passports}
    # imagenet ResNet stems live inside an nn.Sequential with the maxpool
    imagenet_stem = (
        hasattr(model, "block_cls")
        and (getattr(model, "imagenet", False) or model.num_classes == 1000)
    )

    def tmod_of(mod: str) -> str:
        t = _torch_mod(mod)
        if imagenet_stem and mod.split("/")[0] == "convbnrelu_1":
            t = "convbnrelu_1.0" + t[len("convbnrelu_1"):]
        return t

    def t(a, dtype=torch.float32):
        return torch.as_tensor(np.array(a, np.float32, copy=True), dtype=dtype)

    out: Dict[str, Any] = {}
    for path, v in params.items():
        mod, leaf = path.rsplit("/", 1)
        tmod = tmod_of(mod)
        if leaf == "kernel" and mod.endswith("/conv"):
            w = np.asarray(v, np.float32).transpose(3, 2, 0, 1)
            out[f"{tmod}.weight"] = t(w)
            block = mod[: -len("/conv")]
            if block in passport_mods:  # self.weight = self.conv.weight alias
                out[f"{tmod_of(block)}.weight"] = t(w)
        elif leaf == "bias" and mod.endswith("/conv"):
            out[f"{tmod}.bias"] = t(v)
        elif mod.endswith("/bn") and leaf in ("scale", "bias"):
            name = "weight" if leaf == "scale" else "bias"
            out[f"{tmod}.{name}"] = t(v)
        elif leaf in ("scale", "bias"):  # learned affine on a passport block
            out[f"{tmod}.{leaf}"] = t(np.asarray(v).reshape(-1))
        elif leaf == "kernel":  # Dense
            w = np.asarray(v, np.float32).transpose(1, 0)
            chw = _FLATTENED_LINEAR_SHAPES.get((mod, w.shape[1]))
            if chw is not None:
                w = _hwc_to_chw_columns(w, chw)
            out[f"{tmod}.weight"] = t(w)
        else:
            raise ValueError(f"unmapped param {path}")

    for path, v in stats.items():
        mod, leaf = path.rsplit("/", 1)
        tmod = tmod_of(mod)
        name = "running_mean" if leaf == "mean" else "running_var"
        out[f"{tmod}.{name}"] = t(v)
        out[f"{tmod}.num_batches_tracked"] = torch.zeros((), dtype=torch.int64)

    for path, v in passports.items():
        mod, leaf = path.rsplit("/", 1)  # leaf in (key, skey)
        chw = np.asarray(v, np.float32).transpose(0, 3, 1, 2)
        out[f"{tmod_of(mod)}.{leaf}{key_suffix}"] = t(chw)

    for path, v in signatures.items():
        mod, _ = path.rsplit("/", 1)
        tmod = tmod_of(mod)
        out[f"{tmod}.b"] = t(v)
        out[f"{tmod}.{sign_loss_name}.b"] = t(v)

    return out


def save_torch_checkpoint(path: str, model, variables: Dict) -> None:
    """torch.save a reference-loadable .pth from our model/variables."""
    import torch

    torch.save(export_torch_state_dict(model, variables), path)
