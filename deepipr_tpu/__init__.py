"""DeepIPR-TPU: TPU-native deep neural network ownership verification with passports.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of kamwoh/DeepIPR
(NeurIPS 2019 "Rethinking DNN Ownership Verification" / TPAMI 2022 "DeepIPR"):

- Passport layers derive normalization scale/bias from secret passport tensors at
  forward time (reference: models/layers/passportconv2d.py).
- A binary signature is enforced on sign(scale) via a hinge sign loss
  (reference: models/losses/sign_loss.py).
- Training schemes V1 (passport-only), V2 (dual public/private branch), V3
  (V2 + trigger-set backdoor), plus a 5-attack robustness suite.

Design differences from the reference (TPU-first, not a port):
- Functional: losses/metrics flow through return values, not module mutation.
- NHWC layout, bf16-friendly matmuls on the MXU, static shapes under jit.
- The three convolutions of a passport layer (input, key, skey) share one kernel
  and are batched into a single convolution.
- Data parallelism via jax.sharding Mesh + NamedSharding instead of
  torch.nn.DataParallel.
"""

__version__ = "0.1.0"
