"""Experiment orchestration: directories, config, training loops for all schemes.

Mirrors the reference's Experiment / ClassificationExperiment /
ClassificationPrivateExperiment (experiments/base.py, classification.py,
classification_private.py):

- scheme derived from flags: --train-passport -> 1, --train-private -> 2,
  + --train-backdoor -> 3, else 0 (base.py:48-55)
- logdir layout logs/{arch}_{dataset}_v{scheme}[_{tag}]/{expid} with
  auto-incrementing expid; config.json dump; buffered CSV history
- per-epoch: train -> valid -> (wm test) -> signature -> CSV -> best/last ckpt
- V2/V3 select the best checkpoint on (acc_public + acc_private)/2
  (classification_private.py:151)

TPU-native differences: jitted epoch body with device-resident state, full
TrainState checkpoints, explicit PRNG seeds everywhere.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.data.datasets import (
    CyclingIterator,
    DataLoader,
    prepare_dataset,
    prepare_wm,
)
from deepipr_tpu.models.registry import NUM_CLASSES, build_model
from deepipr_tpu.data.prefetch import prefetch
from deepipr_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from deepipr_tpu.train.keys import sample_candidates, setup_passports
from deepipr_tpu.train.schedule import multistep_lr, sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import (
    make_dual_eval_step,
    make_eval_step,
    make_signature_fn,
    make_train_step,
    run_dual_eval,
    run_eval,
)
from deepipr_tpu.utils.checkpoint import load_state, save_state
from deepipr_tpu.utils.config import (
    construct_passport_kwargs,
    mark_separate_stats,
)


class TrainingDiverged(RuntimeError):
    """Raised by the per-epoch finiteness guard (failure detection)."""


# backward alias; the implementation lives beside the other passport-kwargs
# helpers in utils/config.py
_mark_separate_stats = mark_separate_stats


def wm_freeze_warning(best_ep: int, best_metrics: Dict, final_metrics: Dict,
                      margin: float = 20.0) -> Optional[str]:
    """Warn when best.ckpt froze before the trigger set was memorized.

    best.ckpt is selected on validation accuracy alone, matching the
    reference (classification_private.py:151-154). On tasks whose
    validation accuracy saturates early (epoch ~8 on the synthetic
    canonical recipe) the strict `>` freezes best.ckpt there, while
    black-box WM accuracy keeps climbing for tens of epochs — leaving a
    "best" checkpoint whose trigger-set accuracy is chance-level. Pure
    function over the epoch-metric dicts so it is unit-testable.
    """
    bw, fw = (m.get("wm_total_acc", m.get("wm_acc"))
              for m in (best_metrics, final_metrics))
    if bw is None or fw is None or fw - bw <= margin:
        return None
    return (
        f"WARNING: best.ckpt froze at epoch {best_ep} with trigger-set "
        f"accuracy {bw:.1f}% (the final epoch reaches {fw:.1f}%). The best "
        "criterion is validation accuracy only (reference parity); for "
        "black-box WM verification use last.ckpt or an epoch snapshot "
        "taken after WM convergence."
    )


def derive_scheme(args: Dict) -> int:
    if args.get("train_passport"):
        return 1
    if args.get("train_private") and not args.get("train_backdoor"):
        return 2
    if args.get("train_private") and args.get("train_backdoor"):
        return 3
    return 0


class Experiment:
    """Directory layout, config dump, CSV history (reference experiments/base.py)."""

    def __init__(self, args: Dict):
        self.args = dict(args)
        self.arch = args["arch"]
        self.dataset = args["dataset"]
        self.epochs = args["epochs"]
        self.batch_size = args["batch_size"]
        self.lr = args["lr"]
        self.tag = args.get("tag")
        self.save_interval = args.get("save_interval", 0)
        self.scheme = derive_scheme(args)
        self.norm_type = args["norm_type"]
        self.key_type = args["key_type"]
        self.sl_ratio = args["sign_loss"]
        self.use_trigger_as_passport = args.get("use_trigger_as_passport", False)
        self.train_backdoor = args.get("train_backdoor", False)
        self.is_tl = args.get("transfer_learning", False)
        self.tl_dataset = args.get("tl_dataset", "cifar100")
        self.tl_scheme = args.get("tl_scheme", "rtal")
        self.pretrained_path = args.get("pretrained_path")
        self.seed = args.get("seed", 0)

        with open(args["lr_config"]) as f:
            self.lr_config = json.load(f)
        with open(args["passport_config"]) as f:
            self.passport_config = json.load(f)

        self.imgcrop = 224 if self.dataset == "imagenet1000" else 32
        self.in_channels = 3
        self.num_classes = NUM_CLASSES[self.dataset]

        logroot = args.get("logdir", "logs")
        self.logdir = f"{logroot}/{self.arch}_{self.dataset}_v{self.scheme}"
        if self.tag:
            self.logdir += f"_{self.tag}"

        self._csv_first = True

    def makedirs_or_load(self):
        """Create logdir/{next expid} — or, in eval mode, load the existing
        experiment --exp-id's best checkpoint (reference base.py:110-137)."""
        os.makedirs(self.logdir, exist_ok=True)
        if self.args.get("eval"):
            self.logdir = os.path.join(self.logdir, str(self.args.get("exp_id", 1)))
            path = os.path.join(self.logdir, "models", "best.ckpt")
            if os.path.exists(path):
                self.load_model(path)
            else:
                print(f"Warning: No such experiment -> {path}")
            return
        existing = [
            int(d) for d in os.listdir(self.logdir)
            if os.path.isdir(os.path.join(self.logdir, d)) and d.isdigit()
        ]
        expid = min(set(range(1, max(existing, default=0) + 2)) - set(existing))
        self.logdir = os.path.join(self.logdir, str(expid))
        os.makedirs(os.path.join(self.logdir, "models"), exist_ok=True)
        with open(os.path.join(self.logdir, "config.json"), "w") as f:
            try:
                dev = jax.devices()[0]
                backend = f"{jax.default_backend()}:{dev.device_kind}"
            except Exception:
                backend = "unknown"
            json.dump({**self.args, "backend": backend}, f, indent=4)

    def append_history(self, metrics: Dict):
        path = os.path.join(self.logdir, "history.csv")
        cols = sorted(metrics.keys())
        with open(path, "a", newline="") as f:
            w = csv.writer(f)
            if self._csv_first:
                w.writerow(cols)
                self._csv_first = False
            w.writerow([metrics[c] for c in cols])


class ClassificationExperiment(Experiment):
    """All four schemes; `private` follows from the scheme."""

    def __init__(self, args: Dict):
        super().__init__(args)
        self.private = self.scheme in (2, 3)

        self.device_augment = None
        if self.args.get("device_augment"):
            if self.is_tl:
                # TL disables random crop — stays on the host path.
                print("WARNING: --device-augment ignored for transfer "
                      "learning; using the host augmentation path")
                self.args["device_augment"] = False
            elif self.dataset == "imagenet1000":
                # The ImageNet streamer fuses RandomResizedCrop+flip into
                # decode (not expressible as the device pad-crop), so raw
                # shipping moves only the normalize on-device — still a 4x
                # H2D cut on the 224px batches (dataset.py StreamingImageFolder
                # raw=True; measured in benchmarks/bench_streaming_imagenet.py).
                from deepipr_tpu.data.device_augment import normalize_device

                out_dtype = (jnp.bfloat16 if self.args.get("bf16")
                             else jnp.float32)
                self.device_augment = (
                    lambda key, x: normalize_device(x, out_dtype))
            else:
                from deepipr_tpu.data.device_augment import make_device_augment

                self.device_augment = make_device_augment(
                    pad=int((4 / 32) * self.imgcrop),
                    out_dtype=jnp.bfloat16 if self.args.get("bf16")
                    else jnp.float32,
                )

        self.epoch_scan = False
        if self.args.get("epoch_scan"):
            if self.is_tl or self.dataset == "imagenet1000":
                print("WARNING: --epoch-scan ignored for this scheme/dataset "
                      "(TL and streaming ImageNet keep the per-step path)")
            else:
                self.epoch_scan = True

        self.train_data, self.valid_data = prepare_dataset(self.args)
        self.wm_data: Optional[DataLoader] = None
        self.wm_data_raw: Optional[DataLoader] = None
        if self.train_backdoor:
            self.wm_data = prepare_wm(
                self.args.get("trigger_path", "data/trigger_set/pics"),
                crop=self.imgcrop,
                allow_download=bool(self.args.get("download")),
            )
            if self.device_augment is not None or self.epoch_scan:
                # separate raw-uint8 stream for the in-step concat; wm_data
                # stays host-normalized for the WM evaluation passes
                self.wm_data_raw = prepare_wm(
                    self.args.get("trigger_path", "data/trigger_set/pics"),
                    crop=self.imgcrop, raw=True,
                )
        if self.use_trigger_as_passport:
            self.passport_data = prepare_wm(
                self.args.get("trigger_path", "data/trigger_set/pics"),
                crop=self.imgcrop,
                allow_download=bool(self.args.get("download")),
            )
        else:
            self.passport_data = self.valid_data

        self.mesh = make_mesh() if args.get("use_mesh", True) else None
        if self.epoch_scan and self.mesh is not None and self.mesh.size > 1:
            # the scan composes with the mesh: resident dataset replicated,
            # per-step gathers constrained to P('batch') (train/epoch.py);
            # only a non-divisible batch size forces the per-step path
            n_shards = int(self.mesh.shape["batch"])
            if self.batch_size % n_shards != 0:
                print(f"WARNING: --epoch-scan needs batch_size divisible by "
                      f"the {n_shards}-way batch axis; using the per-step "
                      f"path")
                self.epoch_scan = False

        self._construct_model()
        self.makedirs_or_load()

    # ------------------------------------------------------------------ model

    def _construct_model(self):
        use_passport = self.scheme != 0
        if use_passport:
            self.passport_kwargs, self.plkeys = construct_passport_kwargs(
                self.passport_config, self.norm_type, self.key_type, self.sl_ratio
            )
            if self.args.get("separate_stats"):
                _mark_separate_stats(self.passport_kwargs)
        else:
            self.passport_kwargs, self.plkeys = None, []

        self.model = build_model(
            self.arch, self.num_classes, self.norm_type,
            passport_kwargs=self.passport_kwargs, private=self.private,
            imagenet=self.dataset == "imagenet1000",
            dtype=jnp.bfloat16 if self.args.get("bf16") else None,
        )

        rngs = {
            "params": jax.random.key(self.seed),
            "passport": jax.random.key(self.seed + 1),
        }
        sample = jnp.zeros(
            (1, self.imgcrop, self.imgcrop, self.in_channels), jnp.float32
        )
        variables = self.model.init(rngs, sample, train=True)

        steps_per_epoch = len(self.train_data)
        schedule = multistep_lr(self.lr, self.lr_config, steps_per_epoch)
        tx = sgd_optimizer(schedule, momentum=0.9, weight_decay=1e-4)
        self.state = TrainState.create(variables, tx)

        if self.pretrained_path and (self.scheme == 0 or self.is_tl):
            # scheme 0: resume/fine-tune a normal model. TL: the checkpoint
            # being transfer-attacked (reference finetune_load, base.py:85-108).
            self.state = self._load_pretrained_state(
                self.pretrained_path, self.state
            )

        if use_passport and self.key_type != "random" and not self.is_tl:
            self._setup_keys()

        if self.args.get("resume"):
            # True resume (beyond the reference's weights-only ckpts): restores
            # optimizer state, BN stats, passports, signatures, step counter.
            self.state = load_state(self.args["resume"], self.state)
            print(f"Resumed full train state from {self.args['resume']} "
                  f"(step {int(self.state.step)})")

        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        else:
            # the checkpoint loads above restore HOST numpy leaves; commit
            # them to device once, or every jitted call re-ships the full
            # state over the relay's slow H2D link (attacks/cli_common.py
            # measured 172 s + 4.6 GB host RSS per eval epoch before this)
            self.state = jax.device_put(self.state)

        # Compile once; reuse across epochs (re-jitting per epoch would pay
        # the full XLA compile on every evaluation pass).
        self.train_step = make_train_step(
            self.model, private=self.private,
            device_augment=self.device_augment,
            seed=self.seed,
        )
        self.epoch_fn = None
        if self.epoch_scan:
            from deepipr_tpu.train.epoch import (
                device_resident,
                make_epoch_train_fn,
            )

            self._wm_batch = 2  # reference trigger batch (dataset.py:188-191)
            input_stage = "xla"
            if self.args.get("pallas_input"):
                if self.mesh is not None and self.mesh.size > 1:
                    print("WARNING: --pallas-input is single-chip (the fused "
                          "gather kernel is opaque to SPMD); using the XLA "
                          "input stage on this mesh")
                else:
                    input_stage = "pallas"
            self.epoch_fn = make_epoch_train_fn(
                self.model, self.private, self.batch_size,
                pad=int((4 / 32) * self.imgcrop),
                out_dtype=jnp.bfloat16 if self.args.get("bf16")
                else jnp.float32,
                wm_batch=self._wm_batch,
                mesh=self.mesh,
                input_stage=input_stage,
                seed=self.seed,
            )
            self._resident = device_resident(
                self.train_data.images, self.train_data.labels,
                mesh=self.mesh)
            self._resident_wm = ()
            if self.wm_data_raw is not None:
                self._resident_wm = device_resident(
                    self.wm_data_raw.images, self.wm_data_raw.labels,
                    mesh=self.mesh)
        self.eval_steps = {0: make_eval_step(self.model, ind=0)}
        if self.private:
            self.eval_steps[1] = make_eval_step(self.model, ind=1)
            self.dual_eval_step = make_dual_eval_step(self.model)
        self.signature_fn = None
        if self.scheme != 0:
            shape = (1, self.imgcrop, self.imgcrop, self.in_channels)
            self.signature_fn = make_signature_fn(
                self.model, shape, private=self.private
            )

    def _load_pretrained_state(self, path: str, state):
        """--pretrained-path accepts our checkpoint format, a reference
        ``.pth``, or a torchvision state-dict dump (layout sniffed) — the
        reference's pretrained-model sources for key derivation and
        fine-tuning (classification.py:72-91, models/resnet_normal.py:87-99).
        """
        if path.endswith((".pth", ".pt")):
            from deepipr_tpu.interop.torchvision_import import (
                load_torch_pretrained,
            )
            variables = load_torch_pretrained(
                path, state.model_variables(), self.arch
            )
            return state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
                passport=variables.get("passport", state.passport),
                signature=variables.get("signature", state.signature),
            )
        return load_state(path, state, restore_opt=False)

    def _setup_keys(self):
        """Reference setup_keys (classification.py:130-140): sample candidate
        images, run them through a pretrained NORMAL model, snapshot per-layer
        activations as passports."""
        pretrained = build_model(
            self.arch, self.num_classes, self.norm_type,
            imagenet=self.dataset == "imagenet1000",
        )
        rngs = {"params": jax.random.key(self.seed + 2)}
        sample = jnp.zeros(
            (1, self.imgcrop, self.imgcrop, self.in_channels), jnp.float32
        )
        pvars = pretrained.init(rngs, sample, train=True)
        if self.pretrained_path:
            ptmpl = TrainState.create(pvars, sgd_optimizer(0.0))
            ptmpl = self._load_pretrained_state(self.pretrained_path, ptmpl)
            pvars = ptmpl.model_variables()
        else:
            print(
                "WARNING: no --pretrained-path; deriving passports from a "
                "randomly initialized model (the reference would download a "
                "torchvision-pretrained one)."
            )

        n = 1 if self.key_type == "image" else 20
        images = self._passport_candidates()
        kx = sample_candidates(images, n, seed=self.seed + 10)
        ky = sample_candidates(images, n, seed=self.seed + 11)
        new_pp = setup_passports(
            pretrained, pvars, jax.device_get(self.state.passport),
            kx, ky, seed=self.seed + 12,
        )
        self.state = self.state.replace(passport=new_pp)

    def _passport_candidates(self) -> np.ndarray:
        """Normalized images from the passport source (val set or trigger set)."""
        batches = []
        total = 0
        for b in self.passport_data:
            batches.append(b["image"])
            total += len(b["image"])
            if total >= 256:
                break
        return np.concatenate(batches)

    # --------------------------------------------------------------- training

    def _batches(self):
        """Augmented (+ trigger-concatenated) batch stream for one epoch.

        V3 concatenates a size-2 trigger batch onto every task batch
        (reference trainer.py:115-126). Under a multi-device mesh that total
        (B+2) is rarely divisible by the batch axis, so the batch is padded to
        the next multiple with extra trigger images carried at loss weight 0
        — shapes stay static, the loss stays the reference's mean over the
        B+2 real samples.
        """
        wm_source = self.wm_data_raw if self.device_augment is not None else self.wm_data
        wm_iter = CyclingIterator(wm_source) if wm_source else None
        n_shards = int(self.mesh.shape["batch"]) if self.mesh is not None else 1
        for batch in self.train_data:
            if wm_iter is not None and self.device_augment is not None:
                # raw path: the trigger batch rides separately and the train
                # step concatenates on-device after augmenting the task part;
                # the wm side is padded (weight 0) up to shard divisibility
                wb = wm_iter.next()
                images, labels = [wb["image"]], [wb["label"]]
                n_task, n_wm = len(batch["image"]), len(wb["image"])
                pad = (-(n_task + n_wm)) % n_shards
                weight = np.ones(n_task + n_wm + pad, np.float32)
                weight[n_task + n_wm:] = 0.0
                while pad > 0:
                    extra = wm_iter.next()
                    images.append(extra["image"][:pad])
                    labels.append(extra["label"][:pad])
                    pad -= len(extra["image"][:pad])
                batch = {
                    "image": batch["image"],
                    "label": batch["label"],
                    "wm_image": np.concatenate(images),
                    "wm_label": np.concatenate(labels),
                    "weight": weight,
                }
            elif wm_iter is not None:
                wb = wm_iter.next()
                images = [batch["image"], wb["image"]]
                labels = [batch["label"], wb["label"]]
                real = sum(len(x) for x in images)
                pad = (-real) % n_shards
                weight = np.ones(real + pad, np.float32)
                weight[real:] = 0.0
                while pad > 0:
                    extra = wm_iter.next()
                    images.append(extra["image"][:pad])
                    labels.append(extra["label"][:pad])
                    pad -= len(extra["image"][:pad])
                batch = {
                    "image": np.concatenate(images),
                    "label": np.concatenate(labels),
                    "weight": weight,
                }
            yield batch

    def _train_epoch(self, ep: int) -> Dict:
        if self.epoch_fn is not None:
            # device-resident scanned epoch: ONE dispatch, zero per-step H2D
            # (train/epoch.py); step-for-step identical to the per-step path
            t0 = time.time()
            self.state, metrics = self.epoch_fn(
                self.state, *self._resident,
                jax.random.fold_in(jax.random.key(self.seed + 100), ep),
                *self._resident_wm,
            )
            out = {k: float(v) for k, v in metrics.items()}
            steps = len(self._resident[1]) // self.batch_size
            images = steps * self.batch_size
            if self._resident_wm:
                images += steps * self._wm_batch
            out["time"] = time.time() - t0
            out["images_per_sec"] = images / max(out["time"], 1e-9)
            return out
        t0 = time.time()
        sums = None
        count = 0
        images = 0
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        for batch in prefetch(self._batches(), size=2, sharding=sharding):
            images += int(batch["label"].shape[0])
            if "wm_label" in batch:
                images += int(batch["wm_label"].shape[0])
            self.state, metrics = self.train_step(self.state, batch)
            count += 1
            # accumulate as device scalars; a per-step float() would force a
            # host round-trip between every dispatch and serialize the loop
            sums = (
                metrics
                if sums is None
                else jax.tree.map(lambda a, b: a + b, sums, metrics)
            )
        out = {k: float(v) / max(count, 1) for k, v in (sums or {}).items()}
        out["time"] = time.time() - t0
        out["images_per_sec"] = images / max(out["time"], 1e-9)
        return out

    def _dual_eval(self, data, state=None) -> Dict:
        """Evaluate a loader through both branches for private schemes
        (reference TesterPrivate.test, trainer_private.py:218-251) — one data
        pass, shared prefix (steps.make_dual_eval_step); single branch
        otherwise."""
        state = self.state if state is None else state
        if self.private:
            return run_dual_eval(self.dual_eval_step, state, data)
        return run_eval(self.eval_steps[0], state, data)

    def _valid_metrics(self) -> Dict:
        return self._dual_eval(self.valid_data)

    def _signature_metrics(self) -> Dict:
        if self.signature_fn is None:
            return {}
        return self.signature_fn(self.state)

    def save_model(self, name: str, asynchronous: bool = False):
        """asynchronous=True snapshots on device and writes from a worker
        thread (utils/checkpoint.py::AsyncCheckpointer) — on the relay the
        D2H fetch costs seconds and dominated scanned-epoch training."""
        path = os.path.join(self.logdir, "models", name)
        if asynchronous:
            if not hasattr(self, "_async_ckpt"):
                from deepipr_tpu.utils.checkpoint import AsyncCheckpointer

                self._async_ckpt = AsyncCheckpointer()
            self._async_ckpt.save(path, self.state)
        else:
            self._flush_saves()
            save_state(path, self.state)

    def _flush_saves(self):
        if hasattr(self, "_async_ckpt"):
            self._async_ckpt.flush()

    def load_model(self, name_or_path: str):
        self._flush_saves()
        path = (
            name_or_path
            if os.path.exists(name_or_path)
            else os.path.join(self.logdir, "models", name_or_path)
        )
        self.state = load_state(path, self.state)
        if self.mesh is None:
            self.state = jax.device_put(self.state)  # see __init__ note

    def _check_finite(self, ep: int, train_metrics: Dict):
        """Failure detection (beyond the reference, which trains on through
        NaNs): halt with an actionable message the first epoch the loss goes
        non-finite. Passport models are known to diverge above the canonical
        lr 0.01 (the derived scale is unbounded), so point there."""
        bad = {k: v for k, v in train_metrics.items()
               if isinstance(v, float) and not np.isfinite(v)}
        if bad:
            raise TrainingDiverged(
                f"non-finite training metrics at epoch {ep}: {bad}. "
                f"Last good checkpoint: "
                f"{os.path.join(self.logdir, 'models', 'last.ckpt')} "
                f"(resumable with --resume). If this is a passport scheme "
                f"with lr > 0.01, lower the lr — the passport-derived scale "
                f"is unbounded and diverges above the reference's recipe."
            )

    def training(self):
        best = float("-inf")
        best_ep, best_metrics, metrics = 0, {}, {}
        print(f"Start training: scheme {self.scheme}, logdir {self.logdir}")
        if self.save_interval > 0:
            self.save_model("epoch-0.ckpt")  # reference classification.py:271-272
        for ep in range(1, self.epochs + 1):
            if ep == 1 and self.args.get("profile"):
                with jax.profiler.trace(os.path.join(self.logdir, "profile")):
                    train_metrics = self._train_epoch(ep)
            else:
                train_metrics = self._train_epoch(ep)
            self._check_finite(ep, train_metrics)
            valid_metrics = self._valid_metrics()
            wm_metrics = {}
            if self.train_backdoor and self.wm_data is not None:
                # reference 'WM Result': both branches for private schemes
                # (classification_private.py:139)
                wm_metrics = self._dual_eval(self.wm_data)
            sig = self._signature_metrics()

            metrics = {f"train_{k}": v for k, v in train_metrics.items()}
            metrics.update({f"valid_{k}": v for k, v in valid_metrics.items()})
            metrics.update({f"wm_{k}": v for k, v in wm_metrics.items()})
            metrics.update({f"s_{k}": v for k, v in sig.items()})
            self.append_history(metrics)

            crit = (
                metrics["valid_total_acc"]
                if self.private
                else metrics["valid_acc"]
            )
            line = (
                f"Epoch {ep:3d} "
                + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(train_metrics.items())
                )
                + f" | valid={crit:.2f}"
            )
            print(line)

            if self.save_interval and ep % self.save_interval == 0:
                self.save_model(f"epoch-{ep}.ckpt", asynchronous=True)
            if crit > best:
                best = crit
                best_ep, best_metrics = ep, metrics
                self.save_model("best.ckpt", asynchronous=True)
            # --ckpt-every throttles the per-epoch last.ckpt: on a
            # relay-attached chip the ~seconds-long state fetch dominates
            # sub-second scanned epochs (default 1 = reference cadence,
            # classification.py:295-303)
            every = int(self.args.get("ckpt_every") or 1)
            if ep % every == 0 or ep == self.epochs:
                self.save_model("last.ckpt", asynchronous=True)
        self._flush_saves()
        warning = wm_freeze_warning(best_ep, best_metrics, metrics)
        if warning:
            print(warning)
        return best

    def evaluate_only(self):
        return self._valid_metrics()
