"""Import reference (kamwoh/DeepIPR, PyTorch) checkpoints into flax variables.

Key mapping (reference state-dict layout -> this package's module paths):

  features.4.conv.weight   (O,I,H,W) -> params/features_4/conv/kernel (H,W,I,O)
  features.4.bn.weight/bias          -> params/features_4/bn/scale|bias
  features.4.bn.running_mean|var     -> batch_stats/features_4/bn/mean|var
  features.4.key|skey      (1,C,H,W) -> passport/features_4/key|skey (1,H,W,C)
  features.4.key_private|skey_private (V2/V3)      -> same passport slots
  features.4.b                        -> signature/features_4/b
  features.4.scale|bias (learned affine, V2 public) -> params/features_4/scale|bias
  layer1.0.convbnrelu_1.*            -> layer1_0/convbnrelu_1/*
  classifier.weight (out,in)         -> params/classifier/kernel (in,out)
  classifier.1.weight                -> params/classifier_1/kernel
  linear.weight|bias                 -> params/linear/kernel|bias
  *.sign_loss.b / *.sign_loss_private.b / num_batches_tracked -> ignored

Values are converted to f32 numpy; signature decode against imported
checkpoints is bit-exact because sign(scale) only depends on conv kernels and
passports, both of which are copied losslessly (layout transposes only).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths

_IGNORED = ("num_batches_tracked", "sign_loss.b", "sign_loss_private.b")

# Linear layers that consume a *flattened conv feature map*. The reference
# flattens NCHW (`x.view(n, -1)`, models/alexnet_passport_private.py:119) while
# our models flatten NHWC, so the kernel's input dim must be re-ordered
# channel-last on import. Keyed by (module path, in_features):
#   CIFAR AlexNet classifier: Linear(4*4*256, n)  -> feature map (256, 4, 4)
#   ImageNet AlexNet classifier.1: Linear(256*6*6, 4096) after AdaptiveAvgPool
# ResNet's `linear` follows global average pooling (pure channel vector), so
# it needs no re-ordering.
_FLATTENED_LINEAR_SHAPES = {
    ("classifier", 4096): (256, 4, 4),
    ("classifier_1", 9216): (256, 6, 6),
}


def _chw_to_hwc_columns(w: np.ndarray, chw: Tuple[int, int, int]) -> np.ndarray:
    """Reorder a (out, C*H*W) Linear weight's columns to (out, H*W*C)."""
    c, h, wd = chw
    return w.reshape(w.shape[0], c, h, wd).transpose(0, 2, 3, 1).reshape(
        w.shape[0], -1
    )


def _module_path(parts: List[str]) -> str:
    """['features','4'] -> 'features_4'; ['layer1','0','convbn_2'] ->
    'layer1_0/convbn_2'; ['convbnrelu_1','0'] -> 'convbnrelu_1' (imagenet
    stem Sequential index)."""
    out: List[str] = []
    for p in parts:
        if p.isdigit():
            if out and out[-1].startswith(("features", "layer")):
                out[-1] = f"{out[-1]}_{p}"
            elif out and out[-1] == "classifier":
                out[-1] = f"classifier_{p}"
            # else: Sequential wrapper index (e.g. imagenet stem) — drop
        else:
            out.append(p)
    return "/".join(out)


def convert_torch_state_dict(
    sd: Dict[str, Any]
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """torch state dict -> flat {collection-rooted path: array}, + unknown keys
    (keys that matched no mapping rule; deliberately-ignored keys are dropped
    silently)."""
    flat: Dict[str, np.ndarray] = {}
    skipped: List[str] = []

    # The reference passport blocks alias `self.weight = self.conv.weight`
    # (passportconv2d.py:22, passportconv2d_private.py:21), so real state
    # dicts carry a duplicate block-level `weight`; drop the alias.
    aliases = {
        k for k in sd
        if k.endswith(".weight") and f"{k[:-7]}.conv.weight" in sd
    }

    for key, value in sd.items():
        if key in aliases:
            continue
        if any(key.endswith(suf) for suf in _IGNORED):
            continue
        v = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        parts = key.split(".")
        leaf = parts[-1]
        mod = _module_path(parts[:-1])

        if leaf == "weight" and mod.endswith("/conv"):
            flat[f"params/{mod}/kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "bias" and mod.endswith("/conv"):
            flat[f"params/{mod}/bias"] = v
        elif mod.endswith("/bn") and leaf in ("weight", "bias"):
            name = "scale" if leaf == "weight" else "bias"
            flat[f"params/{mod}/{name}"] = v
        elif leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            flat[f"batch_stats/{mod}/{name}"] = v
        elif leaf in ("key", "skey", "key_private", "skey_private"):
            name = "key" if leaf.startswith("key") else "skey"
            flat[f"passport/{mod}/{name}"] = v.transpose(0, 2, 3, 1)
        elif leaf == "b":
            flat[f"signature/{mod}/b"] = v
        elif leaf in ("scale", "bias") and not mod.endswith(("/bn", "/conv")):
            flat[f"params/{mod}/{leaf}"] = v.reshape(-1)
        elif leaf == "weight" and v.ndim == 2:  # Linear
            chw = _FLATTENED_LINEAR_SHAPES.get((mod, v.shape[1]))
            if chw is not None:
                v = _chw_to_hwc_columns(v, chw)
            flat[f"params/{mod}/kernel"] = v.transpose(1, 0)
        elif leaf == "bias" and v.ndim == 1:  # Linear bias (or bare conv bias)
            flat[f"params/{mod}/bias"] = v
        elif leaf == "weight" and v.ndim == 4:  # bare Conv2d (no /conv wrapper)
            flat[f"params/{mod}/kernel"] = v.transpose(2, 3, 1, 0)
        else:
            skipped.append(key)

    return flat, skipped


def import_torch_checkpoint(
    sd: Dict[str, Any], template_variables: Dict, strict: bool = True
) -> Dict:
    """Merge a converted torch state dict into template variables.

    strict=True requires every converted entry to land on an existing path
    with a matching shape.
    """
    flat_new, unknown = convert_torch_state_dict(sd)
    flat_tmpl = dict(flatten_paths(dict(template_variables)))

    unmatched = [f"{k} (unrecognized key)" for k in unknown]
    for path, v in flat_new.items():
        if path not in flat_tmpl:
            unmatched.append(f"{path} (missing in template)")
            continue
        if tuple(np.shape(flat_tmpl[path])) != v.shape:
            unmatched.append(
                f"{path} (shape {v.shape} vs {np.shape(flat_tmpl[path])})"
            )
            continue
        flat_tmpl[path] = v
    if strict and unmatched:
        raise ValueError(
            "torch checkpoint import mismatches:\n  " + "\n  ".join(unmatched)
        )
    return unflatten_paths(flat_tmpl)


def load_torch_checkpoint(path: str, template_variables: Dict,
                          strict: bool = True) -> Dict:
    """Load a reference .pth file (requires torch) and import it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_torch_checkpoint(sd, template_variables, strict=strict)
