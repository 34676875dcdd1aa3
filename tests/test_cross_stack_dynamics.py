"""Cross-stack TRAINING-DYNAMICS parity vs the actual reference (slow).

Forward/logit/signature parity is bit-proven elsewhere
(test_reference_parity.py, test_torch_export.py); this trains BOTH stacks —
the reference's own TrainerPrivate (torch CPU, imported from
/root/reference) and this framework — on identical synthetic tensors with
the scaled-down canonical recipe (training.sh:3-16) and asserts the
dynamics land in the same place:

  - public AND private task accuracy converge (100% on the memorizable
    testbed) in both stacks,
  - sign accuracy reaches 1.0 in both stacks,
  - attack-1 (random fake passports) collapses private accuracy in both
    stacks.

Collapse MAGNITUDE is seed-dominated at this scale (see
docs/demo/cross_stack_seed_smoke.json: torch 34.8-89.7pts, jax 18.2-67.2pts
across seeds 0-2), so the assertion is the qualitative collapse, not a
tight magnitude match; the committed 3-seed full-scale artifact
(docs/demo/cross_stack_parity.json, tools/cross_stack_parity.py) records
the distributions.
"""

import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def results():
    from cross_stack_parity import make_shared_data, run_jax, run_torch

    data = make_shared_data(num_train=512, num_test=256, seed=0)
    torch_res = run_torch(data, epochs=8, batch_size=64, attack_reps=3,
                          eval_every=8, seed=0)
    jax_res = run_jax(data, epochs=8, batch_size=64, attack_reps=3,
                      eval_every=8, seed=0)
    return torch_res, jax_res


class TestCrossStackDynamics:
    def test_task_accuracy_parity(self, results):
        torch_res, jax_res = results
        for res in results:
            assert res["valid_acc_public"] >= 95.0, res["stack"]
            assert res["valid_acc_private"] >= 95.0, res["stack"]
        assert abs(torch_res["valid_acc_private"]
                   - jax_res["valid_acc_private"]) <= 5.0

    def test_sign_accuracy_reaches_one_in_both_stacks(self, results):
        for res in results:
            assert res["sign_acc_min"] == 1.0, res["stack"]

    def test_attack1_collapses_in_both_stacks(self, results):
        for res in results:
            assert res["attack1_collapse"] > 10.0, (
                f"{res['stack']}: fake passports kept "
                f"{res['attack1_acc_mean']:.1f}% — no collapse")

    def test_training_curves_recorded(self, results):
        torch_res, jax_res = results
        assert len(torch_res["history"]) == len(jax_res["history"]) == 8
        for row in (torch_res["history"][-1], jax_res["history"][-1]):
            assert row["train_acc_public"] >= 95.0
