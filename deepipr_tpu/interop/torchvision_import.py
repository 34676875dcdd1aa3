"""Import torchvision-format checkpoints (AlexNet / ResNet-18/34/50/101/152).

The reference's ``pretrained=True`` paths download torchvision weights and
copy them layer-by-layer (models/alexnet_normal.py:64-80,
models/resnet_normal.py:87-99). This zero-egress equivalent maps a LOCAL
torchvision state-dict file onto our variable trees:

torchvision AlexNet:  features.{0,3,6,8,10}.{weight,bias} -> features_{0,2,4,5,6}/conv
                      classifier.{1,4,6}.{weight,bias}    -> classifier_{1,4,6}
torchvision ResNet18: conv1/bn1 -> convbnrelu_1/{conv,bn};
                      layerL.B.convN/bnN -> layerL_B/{convbnrelu_1,convbn_2};
                      layerL.B.downsample.{0,1} -> layerL_B/shortcut;
                      fc -> linear
"""

from __future__ import annotations

from typing import Any, Dict

from deepipr_tpu.interop.torch_import import import_torch_checkpoint

_ALEXNET_FEATURE_MAP = {"0": "0", "3": "2", "6": "4", "8": "5", "10": "6"}
_RESNET_SUB = {"conv1": "convbnrelu_1", "conv2": "convbn_2",
               "bn1": "convbnrelu_1", "bn2": "convbn_2"}
# Bottleneck (resnet50/101/152): three convs per block
_BOTTLENECK_SUB = {"conv1": "convbnrelu_1", "conv2": "convbnrelu_2",
                   "conv3": "convbn_3",
                   "bn1": "convbnrelu_1", "bn2": "convbnrelu_2",
                   "bn3": "convbn_3"}


def _rename_alexnet(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "features" and parts[1] in _ALEXNET_FEATURE_MAP:
            idx = _ALEXNET_FEATURE_MAP[parts[1]]
            out[f"features.{idx}.conv.{parts[2]}"] = v
        elif parts[0] == "classifier":
            out[k] = v  # classifier.{1,4,6}.weight|bias maps directly
        else:
            raise KeyError(f"unexpected torchvision alexnet key: {k}")
    return out


def _rename_resnet(sd: Dict[str, Any], submap: Dict[str, str]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "conv1":
            out[f"convbnrelu_1.conv.{parts[1]}"] = v
        elif parts[0] == "bn1":
            out[f"convbnrelu_1.bn.{parts[1]}"] = v
        elif parts[0] == "fc":
            out[f"linear.{parts[1]}"] = v
        elif parts[0].startswith("layer"):
            layer, block, sub = parts[0], parts[1], parts[2]
            if sub == "downsample":
                which = "conv" if parts[3] == "0" else "bn"
                out[f"{layer}.{block}.shortcut.{which}.{parts[4]}"] = v
            elif sub in submap:
                kind = "conv" if sub.startswith("conv") else "bn"
                out[f"{layer}.{block}.{submap[sub]}.{kind}.{parts[3]}"] = v
            else:
                raise KeyError(f"unexpected torchvision resnet key: {k}")
        else:
            raise KeyError(f"unexpected torchvision resnet key: {k}")
    return out


def import_torchvision(sd: Dict[str, Any], template_variables: Dict,
                       arch: str, strict: bool = True) -> Dict:
    """Map a torchvision state dict onto our variables (arch: alexnet|resnet18)."""
    sd = {k: v for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    if arch == "alexnet":
        renamed = _rename_alexnet(sd)
    elif arch in ("resnet18", "resnet", "resnet34"):
        renamed = _rename_resnet(sd, _RESNET_SUB)
    elif arch in ("resnet50", "resnet101", "resnet152"):
        renamed = _rename_resnet(sd, _BOTTLENECK_SUB)
    else:
        raise ValueError(f"unsupported torchvision arch: {arch}")
    return import_torch_checkpoint(renamed, template_variables, strict=strict)


def load_torch_pretrained(path: str, template_variables: Dict,
                          arch: str, strict: bool = True) -> Dict:
    """Load a ``.pth``/``.pt`` file and import it as pretrained NORMAL-model
    weights, sniffing the layout:

    - reference-layout state dicts (keys like ``features.4.conv.weight`` /
      ``layer4.0.convbnrelu_1.bn.weight`` — what the reference's Experiment
      saves, experiments/base.py:139-150) go through
      ``import_torch_checkpoint``;
    - torchvision-layout state dicts (``features.0.weight`` /
      ``conv1.weight``) go through ``import_torchvision`` — the zero-egress
      stand-in for the reference's ``pretrained=True`` torchvision download
      (models/alexnet_normal.py:64-80, models/resnet_normal.py:87-99, used
      only for the 1000-class ImageNet shape).

    This is what `--pretrained-path model.pth` dispatches to in the train
    CLIs, so reference checkpoints and torchvision dumps both work as the
    key-derivation / fine-tune source without conversion.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("state_dict", "model"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(
                sd[wrapper], dict):
            sd = sd[wrapper]
    if hasattr(sd, "state_dict"):  # a whole pickled nn.Module
        sd = sd.state_dict()
    reference_layout = any(
        ".conv." in k or ".bn." in k or k.startswith(("convbnrelu", "linear."))
        for k in sd
    )
    if reference_layout:
        return import_torch_checkpoint(sd, template_variables, strict=strict)
    return import_torchvision(sd, template_variables, arch, strict=strict)
