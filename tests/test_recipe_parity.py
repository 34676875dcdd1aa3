"""Recipe-level behavioral parity against torch / the actual reference code.

test_reference_parity.py proves model-forward parity; these tests pin the
*training recipe* and *attack math* against their reference implementations:

  - SGD(momentum=0.9, wd=1e-4) + MultiStepLR: our optax chain
    (train/schedule.py) must produce the SAME parameter trajectory as
    torch.optim.SGD + torch.optim.lr_scheduler.MultiStepLR stepped per epoch
    (reference experiments/classification.py:47-57), including the epoch
    boundary alignment of the LR drops.
  - Global magnitude pruning: our jitted global_prune (attacks/pruning.py)
    must zero exactly the same entries as the reference's pruning_resnet
    (reference pruning_attack.py:54-66) on identical weights.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from deepipr_tpu.attacks.pruning import global_prune
from deepipr_tpu.train.schedule import multistep_lr, sgd_optimizer

REFERENCE = "/root/reference"


def _stub_torchvision_full():
    """Stub the torchvision surface that reference/dataset.py imports at module
    scope (dataset.py:9-11); none of those paths run in these tests."""
    import types

    if "torchvision" in sys.modules and "torchvision.datasets.cifar" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: unavailable in tests")

    tv = types.ModuleType("torchvision")
    datasets = types.ModuleType("torchvision.datasets")
    cifar = types.ModuleType("torchvision.datasets.cifar")
    cifar.CIFAR10 = cifar.CIFAR100 = _unavailable
    folder = types.ModuleType("torchvision.datasets.folder")
    folder.pil_loader = folder.make_dataset = folder.ImageFolder = _unavailable
    folder.IMG_EXTENSIONS = (".jpg", ".png")
    transforms_pkg = types.ModuleType("torchvision.transforms")
    transforms_mod = types.ModuleType("torchvision.transforms.transforms")
    transforms_pkg.transforms = transforms_mod
    models = types.ModuleType("torchvision.models")
    models.alexnet = models.resnet18 = _unavailable
    datasets.cifar, datasets.folder = cifar, folder
    tv.datasets, tv.transforms, tv.models = datasets, transforms_pkg, models
    for name, mod in {
        "torchvision": tv,
        "torchvision.datasets": datasets,
        "torchvision.datasets.cifar": cifar,
        "torchvision.datasets.folder": folder,
        "torchvision.transforms": transforms_pkg,
        "torchvision.transforms.transforms": transforms_mod,
        "torchvision.models": models,
    }.items():
        sys.modules.setdefault(name, mod)


class TestSGDMultiStepTrajectoryParity:
    """Same data, same init, 6 epochs x 4 steps with LR drops at epochs 2 and
    4: torch and optax must walk the SAME parameter trajectory."""

    EPOCHS, SPE = 6, 4
    LR, GAMMA = 0.05, 0.1
    MILESTONES = [2, 4]

    def _data(self):
        rng = np.random.default_rng(0)
        xs = rng.standard_normal((self.EPOCHS * self.SPE, 8, 5)).astype(np.float32)
        ys = rng.standard_normal((self.EPOCHS * self.SPE, 8, 3)).astype(np.float32)
        w0 = rng.standard_normal((5, 3)).astype(np.float32) * 0.3
        b0 = rng.standard_normal((3,)).astype(np.float32) * 0.1
        return xs, ys, w0, b0

    def _torch_trajectory(self, xs, ys, w0, b0):
        w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        b = torch.nn.Parameter(torch.from_numpy(b0.copy()))
        opt = torch.optim.SGD([w, b], lr=self.LR, momentum=0.9, weight_decay=1e-4)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=self.MILESTONES, gamma=self.GAMMA)
        traj = []
        i = 0
        for _ in range(self.EPOCHS):
            for _ in range(self.SPE):
                x, y = torch.from_numpy(xs[i]), torch.from_numpy(ys[i])
                opt.zero_grad()
                loss = ((x @ w + b - y) ** 2).mean()
                loss.backward()
                opt.step()
                traj.append(np.concatenate(
                    [w.detach().numpy().ravel(), b.detach().numpy().ravel()]))
                i += 1
            sched.step()  # per-epoch, reference classification.py:173-174
        return np.stack(traj)

    def _jax_trajectory(self, xs, ys, w0, b0):
        lr_config = {"type": "steps", "steps": self.MILESTONES, "gamma": self.GAMMA}
        tx = sgd_optimizer(multistep_lr(self.LR, lr_config, self.SPE))
        params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)
            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        traj = []
        for i in range(self.EPOCHS * self.SPE):
            params, opt_state = step(params, opt_state, xs[i], ys[i])
            traj.append(np.concatenate(
                [np.asarray(params["w"]).ravel(), np.asarray(params["b"]).ravel()]))
        return np.stack(traj)

    def test_trajectories_match(self):
        xs, ys, w0, b0 = self._data()
        t_torch = self._torch_trajectory(xs, ys, w0, b0)
        t_jax = self._jax_trajectory(xs, ys, w0, b0)
        # identical math in f32; tolerance covers summation-order drift only
        np.testing.assert_allclose(t_jax, t_torch, rtol=2e-5, atol=2e-6)

    def test_lr_drop_epochs_align(self):
        """The LR value seen at each step matches torch's per-epoch schedule."""
        lr_config = {"type": "steps", "steps": self.MILESTONES, "gamma": self.GAMMA}
        sched = multistep_lr(self.LR, lr_config, self.SPE)
        got = [float(sched(i)) for i in range(self.EPOCHS * self.SPE)]
        want = []
        for epoch in range(self.EPOCHS):
            lr = self.LR * self.GAMMA ** sum(epoch >= m for m in self.MILESTONES)
            want += [lr] * self.SPE
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestPruningMaskParity:
    """Our global_prune zeroes exactly the entries the reference's
    pruning_resnet zeroes (pruning_attack.py:54-66: global percentile over
    ALL parameters, strict |w| > threshold survival)."""

    @pytest.fixture(scope="class")
    def ref_pruning_resnet(self):
        _stub_torchvision_full()
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from pruning_attack import pruning_resnet
        return pruning_resnet

    @pytest.mark.parametrize("perc", [10, 30, 50, 90])
    def test_masks_match(self, ref_pruning_resnet, perc):
        torch.manual_seed(7)
        model = torch.nn.Sequential(
            torch.nn.Conv2d(3, 4, 3),
            torch.nn.BatchNorm2d(4),
            torch.nn.Linear(6, 5),
        )
        tree = {
            str(i): p.detach().numpy().copy()
            for i, p in enumerate(model.parameters())
        }
        ref_pruning_resnet(model, perc)
        ref_masks = [
            (p.detach().numpy() != 0) for p in model.parameters()
        ]
        ours = global_prune(jax.tree.map(jnp.asarray, tree), float(perc))
        our_masks = [np.asarray(ours[str(i)]) != 0 for i in range(len(ref_masks))]
        for i, (rm, om) in enumerate(zip(ref_masks, our_masks)):
            np.testing.assert_array_equal(
                om, rm, err_msg=f"pruning mask mismatch in tensor {i} at {perc}%")

    def test_zero_percent_is_identity(self, ref_pruning_resnet):
        tree = {"w": jnp.arange(-3.0, 3.0)}
        out = global_prune(tree, 0)
        np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(-3.0, 3.0))
