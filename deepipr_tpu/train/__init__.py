"""Training runtime: state, steps, schedules, key setup, experiments."""

from deepipr_tpu.train.ensemble import (
    init_ensemble,
    make_ensemble_epoch_fn,
    make_ensemble_signature_fn,
    make_ensemble_train_step,
    member_state,
    setup_ensemble_passports,
    shard_ensemble,
    stack_states,
)
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
    "init_ensemble",
    "make_ensemble_epoch_fn",
    "make_ensemble_signature_fn",
    "make_ensemble_train_step",
    "member_state",
    "setup_ensemble_passports",
    "shard_ensemble",
    "stack_states",
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
