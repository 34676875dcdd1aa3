#!/bin/bash
# Full reference attack grid against one canonical checkpoint (VERDICT r2
# item 6; reference attacking.sh + passport_attack_{1,2,3}.py defaults:
# attack-1 50 reps, pruning/flip 0..100%, attack-2 100 retrain epochs,
# attack-3 ambiguity + forge at flipperc {0,10,25,50}%).
#
# Runs on the default platform (the real TPU). Results land in
# logs/passport_attack_*/ and logs/{pruning,flip}_attack/ as CSVs;
# tools/collect_robustness.py assembles ROBUSTNESS.md from them.
#
# Usage: bash tools/run_robustness_grid.sh [ckpt] [arch] [scheme] [cfg] [tag]
set -x
CKPT=${1:-logs/resnet_synthetic_v2_demo200/1/models/best.ckpt}
ARCH=${2:-resnet18}
SCHEME=${3:-2}
CFG=${4:-passport_configs/resnet18_passport.json}
TAG=${5:-200}

COMMON="--arch $ARCH --scheme $SCHEME --loadpath $CKPT --passport-config $CFG --dataset synthetic --tagnum $TAG"

# Attack CSVs are written in "w" mode (cli_common.write_history_csv), so a
# retry after a transient remote-compile drop simply overwrites.
retry() { for i in 1 2 3; do "$@" && return 0; echo "!!! attempt $i failed: $*"; sleep 60; done; return 1; }

retry python passport_attack_1.py $COMMON --attack-rep 50 || exit 1
retry python pruning_attack.py $COMMON || exit 1
retry python flip_attack.py $COMMON || exit 1
for fp in 0.0 0.1 0.25 0.5; do
  retry python passport_attack_2.py $COMMON --flipperc $fp --epochs 100 || exit 1
done
for fp in 0.0 0.1 0.25 0.5; do
  retry python passport_attack_3.py $COMMON --flipperc $fp --epochs 100 --epoch-scan || exit 1
done
if [ "$SCHEME" != "1" ]; then
  # forge regresses onto the learned PUBLIC affine — V2/V3 only (a V1
  # deployment ships its passports; that threat is attack 3 above)
  retry python passport_forge_attack.py $COMMON --flippercs 0,0.1,0.25,0.5 || exit 1
fi
echo GRID-DONE
