#!/bin/bash
# Attack-suite sweep against a trained checkpoint (reference attacking.sh).
CKPT=${1:-logs/resnet_cifar10_v2/1/models/best.ckpt}
ARCH=${2:-resnet18}
SCHEME=${3:-2}
CFG=${4:-passport_configs/resnet18_passport.json}

python passport_attack_1.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG --attack-rep 50
python pruning_attack.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG
python flip_attack.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG
python passport_attack_2.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG --flipperc 0.0
python passport_attack_3.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG --flipperc 0.0
# beyond the reference: forge passports for the stolen model from scratch
# (no original passports, no data) and sweep the ambiguity tradeoff
python passport_forge_attack.py --arch $ARCH --scheme $SCHEME --loadpath $CKPT \
  --passport-config $CFG
