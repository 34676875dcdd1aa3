#!/bin/bash
# Round-5 canonical regeneration (VERDICT r4 items 1+2):
#   0. scheme-0 pretrained model on the synthetic task
#   1. canonical V1/V2/V3 200-epoch runs with --pretrained-path, so passport
#      keys are derived by propagating images through a TRAINED model — the
#      reference's semantics (experiments/classification.py:72-91), which the
#      r4 canonical checkpoints lacked (random-init derivation)
#   2. a random-init V2 control at the same scale (key-provenance delta)
#   3. the full reference attack grid per scheme (attacking.sh semantics)
#   4. canonical-scale transfer-learning legs (rtal/ftal x V1/V2/V3)
# then: python tools/collect_robustness.py --expname resnet_synthetic_v1_demo200/1 \
#         --expname resnet_synthetic_v2_demo200/1 --expname resnet_synthetic_v3_demo200/1 \
#         --copy-src-to docs/demo/robustness_grid
#
# Runs on the default platform (the real TPU). V3 grid/TL target last.ckpt:
# best-on-total-acc freezes before the trigger set is memorized on the
# saturating synthetic task (docs/ROUND4.md item 2).
set -e
cd "$(dirname "$0")/.."
CFG=passport_configs/resnet18_passport.json
T="--arch resnet --dataset synthetic --batch-size 64 --passport-config $CFG --epoch-scan --epochs 200 --ckpt-every 20"
PRE=logs/resnet_synthetic_v0_demo200pre/1/models/best.ckpt

step() { echo "=== [$(date +%T)] $*"; }

# The relay's remote-compile service occasionally drops a response mid-read
# (observed: "response body closed before all bytes were read"); retry each
# step up to 3x. Training steps must wipe their partial rundir between
# attempts or the auto-incrementing expid breaks the hardcoded /1 paths.
retry_train() {  # retry_train <rundir> <cmd...>
  local rundir=$1; shift
  for i in 1 2 3; do
    "$@" && return 0
    echo "!!! attempt $i failed: $* — wiping $rundir and retrying in 60s"
    rm -rf "$rundir"; sleep 60
  done
  echo "!!! giving up: $*"; return 1
}

step "scheme-0 pretrained (200 ep)"
retry_train logs/resnet_synthetic_v0_demo200pre/1 \
  python train_v1.py $T --tag demo200pre
step "V2 canonical (pretrained keys)"
retry_train logs/resnet_synthetic_v2_demo200/1 \
  python train_v23.py $T --train-private --separate-stats --tag demo200 --pretrained-path $PRE
step "V1 canonical (pretrained keys)"
retry_train logs/resnet_synthetic_v1_demo200/1 \
  python train_v1.py $T --train-passport --tag demo200 --pretrained-path $PRE
step "V3 canonical (pretrained keys)"
retry_train logs/resnet_synthetic_v3_demo200/1 \
  python train_v23.py $T --train-backdoor --separate-stats --tag demo200 --pretrained-path $PRE
step "V2 random-init control"
retry_train logs/resnet_synthetic_v2_demo200ri/1 \
  python train_v23.py $T --train-private --separate-stats --tag demo200ri

step "V2 attack grid"
bash tools/run_robustness_grid.sh logs/resnet_synthetic_v2_demo200/1/models/best.ckpt resnet18 2 $CFG 200 || echo "!!! V2 grid failed"
step "V1 attack grid"
bash tools/run_robustness_grid.sh logs/resnet_synthetic_v1_demo200/1/models/best.ckpt resnet18 1 $CFG 200 || echo "!!! V1 grid failed"
step "V3 attack grid (last.ckpt)"
bash tools/run_robustness_grid.sh logs/resnet_synthetic_v3_demo200/1/models/last.ckpt resnet18 3 $CFG 200 || echo "!!! V3 grid failed"

step "random-init control attacks (key-provenance delta)"
RI="--arch resnet18 --scheme 2 --loadpath logs/resnet_synthetic_v2_demo200ri/1/models/best.ckpt --passport-config $CFG --dataset synthetic --tagnum 200"
python passport_attack_1.py $RI --attack-rep 50 || echo "!!! RI attack-1 failed"
python passport_attack_3.py $RI --flipperc 0.0 --epochs 100 --epoch-scan || echo "!!! RI attack-3 failed"

step "transfer-learning legs"
for S in 1 2 3; do
  case $S in
    1) FLAGS="--train-passport"; CLI=train_v1.py
       CK=logs/resnet_synthetic_v1_demo200/1/models/best.ckpt;;
    2) FLAGS="--train-private --separate-stats"; CLI=train_v23.py
       CK=logs/resnet_synthetic_v2_demo200/1/models/best.ckpt;;
    3) FLAGS="--train-backdoor --separate-stats"; CLI=train_v23.py
       CK=logs/resnet_synthetic_v3_demo200/1/models/last.ckpt;;
  esac
  for TLS in rtal ftal; do
    step "TL v$S $TLS"
    retry_train logs/resnet_synthetic_v${S}_demo200tl$TLS/1 \
      python $CLI --arch resnet --dataset synthetic --batch-size 64 \
      --passport-config $CFG $FLAGS --transfer-learning --tl-scheme $TLS \
      --tl-dataset synthetic --epochs 50 --lr-config lr_configs/finetune.json \
      --tag demo200tl$TLS --pretrained-path $CK
  done
done
echo PIPELINE-DONE
