"""Training runtime: state, steps, schedules, key setup, experiments."""

from deepipr_tpu.train.keys import (
    collect_taps,
    get_intermediate_activation,
    sample_candidates,
    setup_passports,
)
from deepipr_tpu.train.schedule import multistep_lr, sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import (
    evaluate,
    make_eval_step,
    make_train_step,
    test_signature,
)

__all__ = [
    "collect_taps",
    "get_intermediate_activation",
    "sample_candidates",
    "setup_passports",
    "multistep_lr",
    "sgd_optimizer",
    "TrainState",
    "evaluate",
    "make_eval_step",
    "make_train_step",
    "test_signature",
]
