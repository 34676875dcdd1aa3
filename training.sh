#!/bin/bash
# Canonical training recipes (reference training.sh): bs 256, 200 epochs,
# lr 0.01, sign-loss 0.1, key-type shuffle.

# V1 passport, AlexNet CIFAR-10
python train_v1.py --train-passport --arch alexnet --dataset cifar10 \
  --batch-size 256 --epochs 200 --lr 0.01 --sign-loss 0.1 --key-type shuffle \
  --passport-config passport_configs/alexnet_passport.json

# V2 private, ResNet-18 CIFAR-10
python train_v23.py --arch resnet --dataset cifar10 \
  --batch-size 256 --epochs 200 --lr 0.01 --sign-loss 0.1 --key-type shuffle \
  --passport-config passport_configs/resnet18_passport.json

# V3 backdoor, ResNet-18 CIFAR-10 (requires data/trigger_set)
python train_v23.py --train-backdoor --arch resnet --dataset cifar10 \
  --batch-size 256 --epochs 200 --lr 0.01 --sign-loss 0.1 --key-type shuffle \
  --passport-config passport_configs/resnet18_passport.json
