"""Multi-host init plumbing: env parsing + CLI flag exposure.

The reference has no multi-node path at all (torch DataParallel only,
experiments/trainer.py:48-49); this is the pod-scale entry point, wired into
the train CLIs behind --multihost.
"""

import subprocess
import sys

import jax
import pytest

from deepipr_tpu.parallel.distributed import maybe_initialize_distributed

_ENV_KEYS = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")


class _Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, *args, **kwargs):
        self.calls.append((args, kwargs))


@pytest.fixture
def recorder(monkeypatch):
    for k in _ENV_KEYS:
        monkeypatch.delenv(k, raising=False)
    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    return rec


def test_noop_without_configuration(recorder):
    assert maybe_initialize_distributed() is False
    assert recorder.calls == []


def test_env_variables_are_parsed(recorder, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert maybe_initialize_distributed() is True
    assert recorder.calls == [
        ((), {"coordinator_address": "10.0.0.1:1234", "num_processes": 4,
              "process_id": 2})
    ]


def test_explicit_args_override_env(recorder, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert maybe_initialize_distributed(
        coordinator_address="10.9.9.9:1", num_processes=8, process_id=7
    ) is True
    assert recorder.calls == [
        ((), {"coordinator_address": "10.9.9.9:1", "num_processes": 8,
              "process_id": 7})
    ]


def test_auto_mode_uses_pod_autodetection(recorder):
    assert maybe_initialize_distributed(auto=True) is True
    assert recorder.calls == [((), {})]


def test_cli_exposes_multihost_flag():
    out = subprocess.run(
        [sys.executable, "train_v1.py", "--help"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "--multihost" in out
