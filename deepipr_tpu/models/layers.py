"""Layer blocks: ConvBlock, PassportBlock, PassportPrivateBlock (Flax Linen).

Functional re-design of the reference's layer blocks
(models/layers/conv2d.py, passportconv2d.py, passportconv2d_private.py):

- Derived scales flow OUT of the module via ``self.sow('passport_aux', ...)``
  instead of being accumulated into stateful SignLoss modules; the train step
  computes the sign loss from the sown aux.
- Passports (key/skey) live in the 'passport' variable collection, the
  signature ``b`` in 'signature' — both non-trainable, checkpointed, and
  swappable (attack surface).
- The input/key/skey convolutions share one kernel and are batched into a
  single convolution (see passport.derive.fused_conv_with_passports) so the
  MXU sees one large matmul per passport layer instead of three.

Variable collections used by models in this package:
  params | batch_stats | passport | signature | passport_aux (sown, per-call)
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepipr_tpu.ops.conv import Conv2D
from deepipr_tpu.ops.norms import StatsBatchNorm, apply_norm, make_norm
from deepipr_tpu.ops.pallas_fused import (
    epilogue_mode,
    epilogue_should_run,
    passport_epilogue_pallas,
)
from deepipr_tpu.passport.codec import encode_signature
from deepipr_tpu.passport.derive import (
    fused_conv_passport_outputs,
    gap_channel_mean,
)

# kaiming_normal(mode='fan_out', nonlinearity='relu') — the reference's conv init
# (conv2d.py:28, passportconv2d.py:88)
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


def _tap_input(module: nn.Module, x):
    """Record this block's input into the 'taps' collection when requested.

    The key-setup pass (train/keys.py) runs a pretrained model over the
    candidate passport images with mutable=['taps'] to collect the activation
    maps entering each block — the reference's set_intermediate_keys walk
    (alexnet_passport.py:104-112, resnet_passport.py:32-65) without the
    layer-by-layer host loop. A no-op unless 'taps' is mutable in apply.
    """
    if not module.is_initializing():
        module.sow("taps", "inp", x)


class ConvBlock(nn.Module):
    """Conv2d -> norm -> optional ReLU (reference: models/layers/conv2d.py:5-36).

    Conv bias exists only when norm_type == 'none', like the reference.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    norm_type: str = "bn"
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        _tap_input(self, x)
        x = Conv2D(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            use_bias=self.norm_type == "none",
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.dtype is None:
            x = x.astype(jnp.float32)
        # under bf16 the whole normalize/ReLU path stays bf16 (BN statistics
        # are still f32 inside flax) — the train step is HBM-roofline-bound
        # and these sweeps dominate its bytes
        norm = make_norm(self.norm_type, self.features, name="bn",
                         dtype=self.dtype)
        x = apply_norm(norm, x, train)
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype) if self.dtype else x


class _PassportMixin:
    """Shared passport machinery for the V1 and V2/V3 passport blocks."""

    def _signature_var(self):
        def init_b():
            return encode_signature(
                self.make_rng("passport"), self.features, self.b_spec
            )

        return self.variable("signature", "b", init_b)

    def _passport_vars(self, x):
        """key/skey variables shaped like a batch-1 slice of this layer's input.

        For key_type='random' these U(-1,1) values ARE the passports
        (reference generates them lazily at first forward,
        passportconv2d.py:209-216); for 'image'/'shuffle' they are placeholders
        overwritten by the key-setup pass (train/keys.py).
        """
        kshape = (1,) + tuple(x.shape[1:])

        def init_passport():
            return jax.random.uniform(
                self.make_rng("passport"), kshape, jnp.float32, -1.0, 1.0
            )

        key = self.variable("passport", "key", init_passport)
        skey = self.variable("passport", "skey", init_passport)
        return key, skey

    def _conv(self):
        return Conv2D(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv",
        )

    def _sow_aux(self, scale, bias, b):
        if self.alpha != 0 and not self.is_initializing():
            self.sow(
                "passport_aux",
                "aux",
                {"scale": scale, "bias": bias, "b": b, "alpha": self.alpha},
            )

    def _derived_affine_forward(self, x, key, skey, conv, norm, train, relu, b):
        """conv([x; key; skey]) -> (scale, bias) derivation -> norm -> affine
        (-> ReLU), sowing the aux for the sign loss.

        On the eval path with BN running stats, measured-profitable shapes
        dispatch to the fused Pallas epilogue (ops/pallas_fused.py: one VMEM
        pass for GAP + normalize + affine + ReLU); everything else uses the
        XLA lowering. Both produce identical scale/bias/output semantics.
        """
        y, key_out, skey_out = fused_conv_passport_outputs(x, key, skey, conv)
        if self.dtype is None:
            y = y.astype(jnp.float32)
        n, h, w, c = y.shape
        if (
            not train
            and not self.is_initializing()
            and isinstance(norm, StatsBatchNorm)
            and y.dtype == jnp.float32  # the Pallas epilogue is f32-only
            and epilogue_should_run(n, h, w, c, bk=key_out.shape[0])
        ):
            mean, var = norm.running_stats(self.features)
            y, scale, bias = passport_epilogue_pallas(
                y, key_out, skey_out, mean, var, eps=norm.epsilon, relu=relu,
                interpret=epilogue_mode() == "interpret",
            )
            scale, bias = scale[0], bias[0]
        else:
            scale = gap_channel_mean(skey_out)  # always f32
            bias = gap_channel_mean(key_out)
            y = apply_norm(norm, y, train)
            y = (
                scale.astype(y.dtype).reshape(1, 1, 1, -1) * y
                + bias.astype(y.dtype).reshape(1, 1, 1, -1)
            )
            if relu:
                y = nn.relu(y)
        self._sow_aux(scale, bias, b.value)
        return y


class PassportBlock(nn.Module, _PassportMixin):
    """V1 passport layer (reference: models/layers/passportconv2d.py:11-223).

    conv (no bias) -> affine-free norm -> scale*x + bias -> optional ReLU,
    where (scale, bias) are derived from the secret passports through the
    layer's own convolution. With ``learnable_affine=True`` (the reference's
    init_scale(True)/init_bias(True), used by attacks and transfer learning),
    learned scale/bias parameters exist and are used unless ``force_passport``.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    norm_type: str = "bn"
    key_type: str = "random"
    alpha: float = 1.0  # sign-loss weight; 0 disables the sign loss
    b_spec: Union[None, int, str] = None
    relu: bool = True
    learnable_affine: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, force_passport: bool = False, train: bool = False):
        _tap_input(self, x)
        conv = self._conv()
        b = self._signature_var()
        key, skey = self._passport_vars(x)
        norm = make_norm(self.norm_type, self.features, affine=False,
                         name="bn", dtype=self.dtype)

        if self.learnable_affine and not force_passport:
            y = conv(x)
            if self.dtype is None:
                y = y.astype(jnp.float32)
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = apply_norm(norm, y, train)
            y = (
                scale.astype(y.dtype).reshape(1, 1, 1, -1) * y
                + bias.astype(y.dtype).reshape(1, 1, 1, -1)
            )
            if self.relu:
                y = nn.relu(y)
        else:
            y = self._derived_affine_forward(
                x, key.value, skey.value, conv, norm, train, self.relu, b
            )
        return y.astype(self.dtype) if self.dtype else y


class PassportPrivateBlock(nn.Module, _PassportMixin):
    """V2/V3 dual-branch passport layer
    (reference: models/layers/passportconv2d_private.py:11-219).

    ind=0 (public/deployment): learned scale/bias parameters.
    ind=1 (private/verification): scale/bias derived from the private passports.
    One shared conv and (by default, like the reference) ONE shared affine-free
    norm serve both branches — running BN stats are updated by whichever branch
    runs. The reference always applies ReLU (passportconv2d_private.py:66)
    because it only places private blocks in BasicBlock positions; relu=False
    supports Bottleneck positions (convbn_3/shortcut), which sit before the
    residual add.

    separate_stats=True gives each branch its own BN running statistics
    ('bn' public / 'bn_private'), the per-branch-norm DeepIPR variant the
    reference's shared-BN version lacks: with shared stats, if the two
    branches' activation distributions diverge during training, the PUBLIC
    branch collapses at eval time because the mixed running stats fit neither
    branch (SURVEY.md §7.5).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    norm_type: str = "bn"
    key_type: str = "random"
    alpha: float = 1.0
    b_spec: Union[None, int, str] = None
    separate_stats: bool = False
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x, ind: int = 0, force_passport: bool = False, train: bool = False
    ):
        _tap_input(self, x)
        conv = self._conv()
        b = self._signature_var()

        # Public affine always exists (reference: init_scale(True) in __init__).
        pub_scale = self.param("scale", nn.initializers.ones, (self.features,))
        pub_bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Passports always exist so both branches share one variable tree.
        key, skey = self._passport_vars(x)

        private_branch = ind != 0 or force_passport
        norm = make_norm(self.norm_type, self.features, affine=False,
                         name="bn", dtype=self.dtype)
        if self.separate_stats and self.norm_type == "bn":
            norm_priv = make_norm(self.norm_type, self.features, affine=False,
                                  name="bn_private", dtype=self.dtype)
            # both stat sets must exist regardless of which branch traces first
            if self.is_initializing():
                z = conv(x).astype(jnp.float32)
                apply_norm(norm, z, train)
                apply_norm(norm_priv, z, train)
            if private_branch:
                norm = norm_priv

        if not private_branch:
            y = conv(x)
            if self.dtype is None:
                y = y.astype(jnp.float32)
            y = apply_norm(norm, y, train)
            y = (
                pub_scale.astype(y.dtype).reshape(1, 1, 1, -1) * y
                + pub_bias.astype(y.dtype).reshape(1, 1, 1, -1)
            )
            if self.relu:
                y = nn.relu(y)
        else:
            y = self._derived_affine_forward(
                x, key.value, skey.value, conv, norm, train, self.relu, b
            )
        return y.astype(self.dtype) if self.dtype else y
