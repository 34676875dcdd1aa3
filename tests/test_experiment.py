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


class TestV3Backdoor:
    """Trigger-set evaluation parity for the private scheme (reference
    classification_private.py:139 and :309)."""

    def test_wm_metrics_cover_both_branches(self, tmp_path):
        exp = ClassificationExperiment(
            base_args(tmp_path, train_private=True, train_backdoor=True))
        exp.training()
        d = os.path.join(str(tmp_path / "logs"), "alexnet_synthetic_v3", "1")
        header = open(os.path.join(d, "history.csv")).readline()
        # 'WM Result' goes through TesterPrivate.test -> both branches
        assert "wm_acc_public" in header
        assert "wm_acc_private" in header
        assert "wm_total_acc" in header

    def test_transfer_learning_retests_backdoor_each_epoch(self, tmp_path):
        from deepipr_tpu.train.transfer import transfer_learning

        exp = ClassificationExperiment(
            base_args(tmp_path, train_private=True, train_backdoor=True))
        exp.training()
        ckpt = os.path.join(exp.logdir, "models", "last.ckpt")

        tl_exp = ClassificationExperiment(base_args(
            tmp_path, train_private=True, train_backdoor=True,
            transfer_learning=True, pretrained_path=ckpt,
            tl_dataset="synthetic"))
        history = transfer_learning(tl_exp)
        assert history, "TL produced no epochs"
        row = history[0]
        # 'Old WM Accuracy': trigger set through the ORIGINAL model with the
        # fine-tuned weights copied back, both branches
        assert "backdoor_acc_public" in row
        assert "backdoor_acc_private" in row
        assert "backdoor_total_acc" in row
        # signature survival is tracked alongside
        assert any(k.startswith("old_wm_passport_private") for k in row)


class TestFailureDetection:
    def test_nan_guard_halts_with_actionable_message(self, tmp_path):
        from deepipr_tpu.train.experiment import TrainingDiverged

        exp = ClassificationExperiment(base_args(tmp_path))
        with pytest.raises(TrainingDiverged, match="lr"):
            exp._check_finite(3, {"loss": float("nan"), "acc": 1.0})
        # finite metrics pass through silently
        exp._check_finite(3, {"loss": 0.5, "acc": 1.0})

    def test_divergent_run_halts(self, tmp_path, monkeypatch):
        from deepipr_tpu.train import experiment as exp_mod

        exp = ClassificationExperiment(base_args(tmp_path))
        monkeypatch.setattr(
            exp, "_train_epoch", lambda ep: {"loss": float("inf")})
        with pytest.raises(exp_mod.TrainingDiverged):
            exp.training()
