"""ResNet family: normal / V1 passport / V2-V3 private passport (Flax).

Topology matches the reference (models/resnet_normal.py, resnet_passport.py,
resnet_passport_private.py):

- BasicBlock: convbnrelu_1 -> convbn_2 (NOTE: the reference applies ReLU inside
  convbn_2 as well, resnet_normal.py:16) -> + shortcut(x) -> ReLU; the shortcut
  ConvBlock also carries a ReLU (resnet_normal.py:19-20). We replicate this
  faithfully rather than "fixing" it.
- Bottleneck: 1x1 -> 3x3 -> 1x1(no relu) + shortcut(no relu) -> ReLU.
- CIFAR stem: 3x3 s1; ImageNet stem: 7x7 s2 + MaxPool(3,2,1).
- Per-sub-block passport flags via nested passport_kwargs
  (layerN -> block idx -> convbnrelu_1/convbn_2/shortcut).

Module names follow the reference's state-dict paths (layer1_0/convbnrelu_1 etc.)
for config/interop parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn

from deepipr_tpu.models.layers import ConvBlock, PassportBlock, PassportPrivateBlock
from deepipr_tpu.ops.pooling import global_avg_pool, max_pool2d


def _make_block(
    layer_kwargs: Optional[Dict[str, Any]],
    norm_type: str,
    features: int,
    k: int,
    s: int,
    p: int,
    name: str,
    private: bool,
    relu: bool,
    dtype,
):
    if layer_kwargs is not None and layer_kwargs["flag"]:
        common = dict(
            features=features,
            kernel_size=k,
            strides=s,
            padding=p,
            norm_type=layer_kwargs["norm_type"],
            key_type=layer_kwargs["key_type"],
            alpha=layer_kwargs["sign_loss"],
            b_spec=layer_kwargs.get("b"),
            dtype=dtype,
            name=name,
        )
        if private:
            # relu=True in every BasicBlock position (reference :66 always
            # ReLUs); Bottleneck convbn_3/shortcut positions pass relu=False
            return PassportPrivateBlock(
                separate_stats=layer_kwargs.get("separate_stats", False),
                relu=relu,
                **common,
            )
        return PassportBlock(
            relu=relu,
            learnable_affine=layer_kwargs.get("learnable_affine", False),
            **common,
        )
    nt = layer_kwargs["norm_type"] if layer_kwargs is not None else norm_type
    return ConvBlock(
        features=features, kernel_size=k, strides=s, padding=p,
        norm_type=nt, relu=relu, dtype=dtype, name=name,
    )


def _call_block(block, x, force_passport, ind, train):
    if isinstance(block, PassportPrivateBlock):
        return block(x, ind=ind, force_passport=force_passport, train=train)
    if isinstance(block, PassportBlock):
        return block(x, force_passport=force_passport, train=train)
    return block(x, train=train)


class BasicBlock(nn.Module):
    """Residual basic block; passport_kwargs maps sub-block name -> layer kwargs."""

    expansion = 1

    in_planes: int
    planes: int
    stride: int = 1
    norm_type: str = "bn"
    passport_kwargs: Optional[Dict[str, Any]] = None
    private: bool = False
    dtype: Any = None

    def _sub_kwargs(self, name):
        return None if self.passport_kwargs is None else self.passport_kwargs[name]

    @nn.compact
    def __call__(self, x, force_passport=False, ind=0, train=False):
        b1 = _make_block(
            self._sub_kwargs("convbnrelu_1"), self.norm_type, self.planes,
            3, self.stride, 1, "convbnrelu_1", self.private, True, self.dtype,
        )
        b2 = _make_block(
            self._sub_kwargs("convbn_2"), self.norm_type, self.planes,
            3, 1, 1, "convbn_2", self.private, True, self.dtype,
        )
        out = _call_block(b1, x, force_passport, ind, train)
        out = _call_block(b2, out, force_passport, ind, train)

        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = _make_block(
                self._sub_kwargs("shortcut"), self.norm_type,
                self.expansion * self.planes, 1, self.stride, 0,
                "shortcut", self.private, True, self.dtype,
            )
            out = out + _call_block(sc, x, force_passport, ind, train)
        else:
            out = out + x
        return nn.relu(out)


class Bottleneck(nn.Module):
    """Bottleneck block. The reference only supports passports in BasicBlock
    positions (models/resnet_passport.py:10-17 handles BasicBlock only, and
    only ResNet18 gets a private factory, resnet_passport_private.py:185-186);
    passport/private Bottlenecks are a capability extension of this rebuild —
    convbn_3/shortcut keep relu=False so the residual-add semantics are
    unchanged when a position is passport-flagged."""

    expansion = 4

    in_planes: int
    planes: int
    stride: int = 1
    norm_type: str = "bn"
    passport_kwargs: Optional[Dict[str, Any]] = None
    private: bool = False
    dtype: Any = None

    def _sub_kwargs(self, name):
        # configs may omit 'shortcut' for blocks without one
        return None if self.passport_kwargs is None else self.passport_kwargs.get(name)

    @nn.compact
    def __call__(self, x, force_passport=False, ind=0, train=False):
        b1 = _make_block(
            self._sub_kwargs("convbnrelu_1"), self.norm_type, self.planes,
            1, 1, 0, "convbnrelu_1", self.private, True, self.dtype,
        )
        b2 = _make_block(
            self._sub_kwargs("convbnrelu_2"), self.norm_type, self.planes,
            3, self.stride, 1, "convbnrelu_2", self.private, True, self.dtype,
        )
        b3 = _make_block(
            self._sub_kwargs("convbn_3"), self.norm_type,
            self.planes * self.expansion, 1, 1, 0, "convbn_3", self.private,
            False, self.dtype,
        )
        out = _call_block(b1, x, force_passport, ind, train)
        out = _call_block(b2, out, force_passport, ind, train)
        out = _call_block(b3, out, force_passport, ind, train)
        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = _make_block(
                self._sub_kwargs("shortcut"), self.norm_type,
                self.planes * self.expansion, 1, self.stride, 0,
                "shortcut", self.private, False, self.dtype,
            )
            out = out + _call_block(sc, x, force_passport, ind, train)
        else:
            out = out + x
        return nn.relu(out)


class ResNet(nn.Module):
    """Generic ResNet; passport_kwargs=None gives the normal model."""

    block_cls: type
    num_blocks: Sequence[int]
    num_classes: int = 10
    norm_type: str = "bn"
    passport_kwargs: Optional[Dict[str, Any]] = None
    private: bool = False
    imagenet: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, force_passport=False, ind=0, train=False,
                 start_at=None, tap_at=None):
        """start_at: run only from the named unit onward (x is that unit's
        input — used by the split dual-forward train step, train/steps.py).
        tap_at: sow the named unit's input into 'branch_tap'."""
        is_imagenet = self.imagenet or self.num_classes == 1000
        pk = self.passport_kwargs
        started = start_at is None

        def begin(name):
            nonlocal started
            if not started and name == start_at:
                started = True
            if started and tap_at == name and not self.is_initializing():
                self.sow("branch_tap", "x", x)
            return started

        if begin("convbnrelu_1"):
            stem_kwargs = None if pk is None else pk["convbnrelu_1"]
            if is_imagenet:
                stem = _make_block(stem_kwargs, self.norm_type, 64, 7, 2, 3,
                                   "convbnrelu_1", self.private, True, self.dtype)
                x = _call_block(stem, x, force_passport, ind, train)
                x = max_pool2d(x, 3, 2, padding=1)
            else:
                stem = _make_block(stem_kwargs, self.norm_type, 64, 3, 1, 1,
                                   "convbnrelu_1", self.private, True, self.dtype)
                x = _call_block(stem, x, force_passport, ind, train)

        in_planes = 64
        for li, (planes, n, stride) in enumerate(
            zip((64, 128, 256, 512), self.num_blocks, (1, 2, 2, 2)), start=1
        ):
            layer_pk = None if pk is None else pk[f"layer{li}"]
            strides = [stride] + [1] * (n - 1)
            for bi, s in enumerate(strides):
                in_planes_here = in_planes
                in_planes = planes * self.block_cls.expansion
                if not begin(f"layer{li}_{bi}"):
                    continue
                block_pk = None if layer_pk is None else layer_pk[str(bi)]
                blk = self.block_cls(
                    in_planes=in_planes_here, planes=planes, stride=s,
                    norm_type=self.norm_type, passport_kwargs=block_pk,
                    private=self.private, dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )
                x = blk(x, force_passport=force_passport, ind=ind, train=train)

        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, name="linear")(x)


def _factory(block_cls, num_blocks):
    def make(num_classes=10, norm_type="bn", passport_kwargs=None, private=False,
             imagenet=False, dtype=None):
        return ResNet(
            block_cls=block_cls, num_blocks=num_blocks, num_classes=num_classes,
            norm_type=norm_type, passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )

    return make


ResNet9 = _factory(BasicBlock, (1, 1, 1, 1))
ResNet18 = _factory(BasicBlock, (2, 2, 2, 2))
ResNet34 = _factory(BasicBlock, (3, 4, 6, 3))
ResNet50 = _factory(Bottleneck, (3, 4, 6, 3))
ResNet101 = _factory(Bottleneck, (3, 4, 23, 3))
ResNet152 = _factory(Bottleneck, (3, 8, 36, 3))


def ResNet18Passport(num_classes=10, passport_kwargs=None, norm_type="bn", dtype=None,
                     imagenet=False):
    return ResNet18(num_classes=num_classes, norm_type=norm_type,
                    passport_kwargs=passport_kwargs, imagenet=imagenet, dtype=dtype)


def ResNet9Passport(num_classes=10, passport_kwargs=None, norm_type="bn", dtype=None,
                    imagenet=False):
    return ResNet9(num_classes=num_classes, norm_type=norm_type,
                   passport_kwargs=passport_kwargs, imagenet=imagenet, dtype=dtype)


def ResNet18Private(num_classes=10, passport_kwargs=None, norm_type="bn", dtype=None,
                    imagenet=False):
    return ResNet18(num_classes=num_classes, norm_type=norm_type,
                    passport_kwargs=passport_kwargs, private=True,
                    imagenet=imagenet, dtype=dtype)


# Bottleneck passport models — beyond the reference (its passport machinery
# stops at BasicBlock, models/resnet_passport.py:10-17); same config format,
# sub-block names convbnrelu_1/convbnrelu_2/convbn_3/shortcut.

def ResNet50Passport(num_classes=10, passport_kwargs=None, norm_type="bn", dtype=None,
                     imagenet=False):
    return ResNet50(num_classes=num_classes, norm_type=norm_type,
                    passport_kwargs=passport_kwargs, imagenet=imagenet, dtype=dtype)


def ResNet50Private(num_classes=10, passport_kwargs=None, norm_type="bn", dtype=None,
                    imagenet=False):
    return ResNet50(num_classes=num_classes, norm_type=norm_type,
                    passport_kwargs=passport_kwargs, private=True,
                    imagenet=imagenet, dtype=dtype)
