"""Experiment-level integration: scheme selection, logdir artifacts, training."""

import json
import os

import pytest

from deepipr_tpu.train.experiment import ClassificationExperiment, derive_scheme


def base_args(tmp_path, **over):
    args = {
        "arch": "alexnet",
        "dataset": "synthetic",
        "batch_size": 64,
        "epochs": 1,
        "lr": 0.01,
        "norm_type": "bn",
        "key_type": "shuffle",
        "sign_loss": 0.1,
        "use_trigger_as_passport": False,
        "train_passport": False,
        "train_backdoor": False,
        "train_private": False,
        "pretrained_path": None,
        "lr_config": "lr_configs/finetune.json",
        "passport_config": "passport_configs/alexnet_passport.json",
        "save_interval": 0,
        "eval": False,
        "exp_id": 1,
        "tag": None,
        "seed": 0,
        "transfer_learning": False,
        "tl_dataset": "synthetic",
        "tl_scheme": "rtal",
        "logdir": str(tmp_path / "logs"),
        "synthetic_train": 256,
        "synthetic_test": 128,
    }
    args.update(over)
    return args


class TestSchemeDerivation:
    def test_flags_to_scheme(self):
        assert derive_scheme({}) == 0
        assert derive_scheme({"train_passport": True}) == 1
        assert derive_scheme({"train_private": True}) == 2
        assert derive_scheme({"train_private": True, "train_backdoor": True}) == 3


class TestExperimentRuns:
    @pytest.mark.parametrize("scheme_flags,dirname", [
        ({}, "alexnet_synthetic_v0"),
        ({"train_passport": True}, "alexnet_synthetic_v1"),
        ({"train_private": True}, "alexnet_synthetic_v2"),
    ])
    def test_training_writes_artifacts(self, tmp_path, scheme_flags, dirname):
        exp = ClassificationExperiment(base_args(tmp_path, **scheme_flags))
        exp.training()
        d = os.path.join(str(tmp_path / "logs"), dirname, "1")
        assert os.path.exists(os.path.join(d, "config.json"))
        assert os.path.exists(os.path.join(d, "history.csv"))
        assert os.path.exists(os.path.join(d, "models", "best.ckpt"))
        assert os.path.exists(os.path.join(d, "models", "last.ckpt"))
        cfg = json.load(open(os.path.join(d, "config.json")))
        assert cfg["dataset"] == "synthetic"
        header = open(os.path.join(d, "history.csv")).readline()
        assert "train_loss" in header
        if scheme_flags.get("train_private"):
            assert "valid_total_acc" in header
            assert "s_private_features_4" in header
        elif scheme_flags.get("train_passport"):
            assert "s_public_features_4" in header

    def test_expid_increments(self, tmp_path):
        a1 = ClassificationExperiment(base_args(tmp_path))
        a2 = ClassificationExperiment(base_args(tmp_path))
        assert a1.logdir.endswith("/1")
        assert a2.logdir.endswith("/2")
