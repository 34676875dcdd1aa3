"""Attack suite: fake-passport (1), reverse-engineering (2), ambiguity (3),
pruning, sign-flipping, and deployment-forgery attacks."""

from deepipr_tpu.attacks.ambiguity import ambiguity_attack, flip_signature_bits
from deepipr_tpu.attacks.common import (
    derived_affines,
    detect_signature_from_affines,
    global_sign_flip,
    plkey_to_module_path,
)
from deepipr_tpu.attacks.fake_passport import random_passport_attack
from deepipr_tpu.attacks.forge import forge_attack, forged_signature_accuracy
from deepipr_tpu.attacks.flip import flip_attack, materialize_affines
from deepipr_tpu.attacks.pruning import global_prune, pruning_attack
from deepipr_tpu.attacks.reverse import reverse_attack

__all__ = [
    "ambiguity_attack",
    "flip_signature_bits",
    "derived_affines",
    "detect_signature_from_affines",
    "global_sign_flip",
    "plkey_to_module_path",
    "random_passport_attack",
    "forge_attack",
    "forged_signature_accuracy",
    "flip_attack",
    "materialize_affines",
    "global_prune",
    "pruning_attack",
    "reverse_attack",
]
