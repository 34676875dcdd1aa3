#!/usr/bin/env python
"""Train baseline (scheme 0) or V1 passport (scheme 1) models.

CLI mirrors the reference train_v1.py flags; extras: --dataset synthetic
(offline stand-in), --data-root, --seed, --logdir.
"""

import argparse
from pprint import pprint


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="alexnet",
                   choices=["alexnet", "resnet", "resnet9", "resnet34", "resnet50"],
                   help="architecture (default: alexnet)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "cifar100", "caltech-101",
                            "caltech-256", "imagenet1000", "synthetic"])
    p.add_argument("--norm-type", default="bn",
                   choices=["bn", "gn", "in", "none"])

    # passport arguments
    p.add_argument("--key-type", choices=["random", "image", "shuffle"],
                   default="shuffle")
    p.add_argument("--sign-loss", type=float, default=0.1)
    p.add_argument("--use-trigger-as-passport", action="store_true",
                   default=False)
    p.add_argument("--separate-stats", action="store_true", default=False,
                   help="V2/V3: per-branch BN running statistics (the "
                        "per-branch-norm DeepIPR variant; the reference "
                        "shares one BN, which can collapse the public "
                        "branch at eval)")

    p.add_argument("--train-passport", action="store_true", default=False)
    p.add_argument("--train-backdoor", action="store_true", default=False)
    p.add_argument("--train-private", action="store_true", default=False)

    # paths
    p.add_argument("--pretrained-path")
    p.add_argument("--lr-config", default="lr_configs/default.json")
    p.add_argument("--passport-config",
                   default="passport_configs/alexnet_passport.json")
    p.add_argument("--trigger-path", default="data/trigger_set/pics")
    p.add_argument("--data-root", default="data")
    p.add_argument("--caltech-split", default="shuffled",
                   choices=["shuffled", "reference"],
                   help="Caltech 80/20 per-class split: seeded shuffle "
                        "(default) or the reference's exact sorted-filename "
                        "split (dataset.py:57-61)")
    p.add_argument("--download", action="store_true", default=False,
                   help="fetch + extract missing Caltech archives "
                        "(reference dataset.py:89-130; needs egress — "
                        "without it a pre-placed archive is auto-extracted)")
    p.add_argument("--logdir", default="logs")
    p.add_argument("--workers", type=int, default=16,
                   help="decode threads for the streaming ImageNet loader")
    p.add_argument("--no-draft", dest="draft", action="store_false",
                   default=True,
                   help="disable JPEG DCT-domain draft decode in the "
                        "streaming loader (full-resolution decode)")
    p.add_argument("--imagenet-cache",
                   help="directory for the resized-uint8 ImageNet decode "
                        "cache (epochs after the first skip JPEG decode)")

    # misc
    p.add_argument("--multihost", action="store_true", default=False,
                   help="initialize jax.distributed before device use "
                        "(TPU pod auto-detect, or JAX_COORDINATOR_ADDRESS/"
                        "JAX_NUM_PROCESSES/JAX_PROCESS_ID)")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bf16 on the MXU and normalize path (statistics and "
                        "passport derivation stay f32)")
    p.add_argument("--device-augment", action="store_true", default=False,
                   help="run crop/flip/normalize on-device inside the train "
                        "step (host ships raw uint8 batches; V3 triggers "
                        "concat on-device, normalize-only)")
    p.add_argument("--epoch-scan", action="store_true", default=False,
                   help="device-resident training: park the dataset in HBM "
                        "and run each epoch as ONE lax.scan dispatch with "
                        "on-device augmentation (single-chip, in-memory "
                        "datasets; ~2x end-to-end vs per-step dispatch on "
                        "transfer-bound hosts)")
    p.add_argument("--pallas-input", action="store_true", default=False,
                   help="with --epoch-scan: use the Pallas fused DMA gather "
                        "+ crop/flip/normalize input stage "
                        "(ops/pallas_augment.py; 1.56x the XLA stage on "
                        "v5e, bit-identical batches). Single-chip only — "
                        "meshes keep the XLA stage")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="save last.ckpt every N epochs (default 1 = the "
                        "reference's cadence; raise on hosts where the "
                        "checkpoint fetch outweighs an epoch)")
    p.add_argument("--profile", action="store_true", default=False,
                   help="capture a jax.profiler trace of epoch 1 into logdir")
    p.add_argument("--resume", help="full-train-state checkpoint to resume from")
    p.add_argument("--save-interval", type=int, default=0)
    p.add_argument("--eval", action="store_true", default=False)
    p.add_argument("--exp-id", type=int, default=1)
    p.add_argument("--tag")
    p.add_argument("--seed", type=int, default=0)

    # transfer learning
    p.add_argument("--transfer-learning", action="store_true", default=False)
    p.add_argument("--tl-dataset", default="cifar100",
                   choices=["cifar10", "cifar100", "caltech-101",
                            "caltech-256", "imagenet1000", "synthetic"])
    p.add_argument("--tl-scheme", default="rtal", choices=["rtal", "ftal"])
    return p


def maybe_init_multihost(args):
    """--multihost: bring up jax.distributed before any device use."""
    if not args.get("multihost"):
        return
    import jax

    from deepipr_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(auto=True)
    print(f"multihost: process {jax.process_index()} of {jax.process_count()},"
          f" {jax.local_device_count()} local / {jax.device_count()} global "
          "devices")


def main():
    args = vars(build_parser().parse_args())
    pprint(args)
    maybe_init_multihost(args)

    from deepipr_tpu.train.experiment import ClassificationExperiment

    exp = ClassificationExperiment(args)
    if args["eval"]:
        print(exp.evaluate_only())
    elif exp.is_tl:
        from deepipr_tpu.train.transfer import transfer_learning

        transfer_learning(exp)
    else:
        exp.training()
    print("Training done at", exp.logdir)


if __name__ == "__main__":
    main()
