#!/usr/bin/env python
"""PyTorch-CPU throughput baseline for the north-star benchmark.

Measures images/sec of a ResNet-18 V2 private-passport training step
(dual public/private forward, CE + sign loss, SGD) on CPU with torch —
an independent, compact implementation of the same math the reference
(kamwoh/DeepIPR) trains, used ONLY to establish the vs_baseline ratio in
bench.py (BASELINE.md: ">= 5x PyTorch-CPU baseline").

Writes benchmarks/baseline_torch_cpu.json.
"""

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class PassportConv(nn.Module):
    """conv -> affine-free BN -> (public affine | passport-derived affine) -> relu."""

    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(cout, affine=False)
        self.scale = nn.Parameter(torch.ones(cout))
        self.bias = nn.Parameter(torch.zeros(cout))
        self.register_buffer("key", torch.rand(1, cin, 32 // s, 32 // s) * 2 - 1)
        self.register_buffer("skey", torch.rand(1, cin, 32 // s, 32 // s) * 2 - 1)
        self.register_buffer("b", torch.sign(torch.rand(cout) - 0.5))

    def forward(self, x, ind):
        y = self.bn(self.conv(x))
        if ind == 0:
            s, b = self.scale, self.bias
            sign_loss = y.new_zeros(())
        else:
            s = self.conv(self.skey).flatten(2).mean((0, 2))
            b = self.conv(self.key).flatten(2).mean((0, 2))
            sign_loss = (0.1 * F.relu(0.1 - self.b * s)).sum() + 1e-5 * (s * s).sum()
        return F.relu(s.view(1, -1, 1, 1) * y + b.view(1, -1, 1, 1)), sign_loss


class Block(nn.Module):
    def __init__(self, cin, cout, stride, passport):
        super().__init__()
        mk = PassportConv if passport else lambda *a: ConvBNReLU(*a)
        self.c1 = mk(cin, cout, 3, stride, 1)
        self.c2 = mk(cout, cout, 3, 1, 1)
        self.sc = (
            mk(cin, cout, 1, stride, 0) if (stride != 1 or cin != cout) else None
        )
        self.passport = passport

    def forward(self, x, ind):
        sl = x.new_zeros(())

        def run(m, v):
            nonlocal sl
            if isinstance(m, PassportConv):
                out, s = m(v, ind)
                sl = sl + s
                return out
            return m(v)

        out = run(self.c2, run(self.c1, x))
        out = out + (run(self.sc, x) if self.sc is not None else x)
        return F.relu(out), sl


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class ResNet18V2(nn.Module):
    """CIFAR ResNet-18 with passports on layer4 (the reference's shipped config)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = ConvBNReLU(3, 64, 3, 1, 1)
        cfg = [(64, 64, 1, False, 2), (64, 128, 2, False, 2),
               (128, 256, 2, False, 2), (256, 512, 2, True, 2)]
        blocks = []
        for cin, cout, stride, pp, n in cfg:
            blocks.append(Block(cin, cout, stride, pp))
            for _ in range(n - 1):
                blocks.append(Block(cout, cout, 1, pp))
        self.blocks = nn.ModuleList(blocks)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x, ind):
        x = self.stem(x)
        sl = x.new_zeros(())
        for b in self.blocks:
            x, s = b(x, ind)
            sl = sl + s
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x), sl


def main(batch_size=64, steps=10, warmup=2):
    torch.manual_seed(0)
    model = ResNet18V2()
    opt = torch.optim.SGD(model.parameters(), lr=0.01, momentum=0.9,
                          weight_decay=1e-4)
    x = torch.randn(batch_size, 3, 32, 32)
    y = torch.randint(0, 10, (batch_size,))

    def step():
        opt.zero_grad()
        loss = x.new_zeros(())
        for ind in range(2):
            logits, sl = model(x, ind)
            loss = loss + F.cross_entropy(logits, y) + sl
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = time.time() - t0
    ips = batch_size * steps / dt
    out = {
        "metric": "images/sec (ResNet-18 V2 passport train, CIFAR shapes, torch CPU)",
        "images_per_sec": ips,
        "batch_size": batch_size,
        "steps": steps,
        "torch_threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_torch_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
