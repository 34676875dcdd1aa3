#!/usr/bin/env python
"""Tensor-parallel characterization: comm volume + step time, replicated vs TP.

For ResNet-18 (BasicBlock) and ResNet-50 (Bottleneck) V2 private models on a
4x2 (batch x model) mesh (VERDICT r3 item 8):

- counts 'model'-axis collectives in the compiled train-step HLO and sums
  their bytes (the DP gradient all-reduce rides the size-4 'batch' groups;
  TP activation psums/gathers ride the size-2 'model' groups — separable by
  replica-group shape),
- reports per-device parameter bytes (the memory win TP buys),
- A/B wall-clock per step.

Runs on the virtual 8-device CPU mesh (no TPU needed — comm volume and
shard counts are compile-time facts; CPU step time is an ordering signal
only, not a TPU prediction). The CPU platform is forced in-process (the
axon sitecustomize pins JAX_PLATFORMS, so env vars alone don't work):

    python benchmarks/bench_tensor_parallel.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _collective_census(hlo_text: str, model_group_size: int):
    """Sum bytes moved by collectives, split by replica-group size.

    GSPMD lowers the 'model'-axis psums/gathers to replica_groups of size
    `model_group_size`; the DP gradient all-reduce uses the complementary
    size. Bytes = the instruction's RESULT shape (tuple shapes summed over
    components) — the full-buffer proxy per all-reduce semantics; relative
    comparison across modes is what matters.

    Handles what XLA actually emits: tuple-shaped combined collectives
    ("(f32[...], f32[...]) all-reduce(...)" from the all-reduce combiner),
    async -start forms, and BOTH replica-group encodings — explicit lists
    ("replica_groups={{0,1},{2,3}}") and iota form
    ("replica_groups=[4,2]<=[8]" = 4 groups of size 2; N-dim iota like
    [2,2,2]<=[8] uses the LAST dimension as the group size).

    reduce-scatter's RESULT is the per-shard output, so its bytes are
    scaled by group_size to the full logical buffer — making RS, AG and AR
    byte counts commensurable (all report the logical buffer moved).
    """
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "u8": 1, "s8": 1, "f64": 8}
    ops = []
    for m in re.finditer(
        r"= (\([^)]*\)|\S+) (all-reduce|all-gather|reduce-scatter|"
        r"collective-permute)(?:-start)?\(", hlo_text,
    ):
        shape_str, kind = m.group(1), m.group(2)
        eol = hlo_text.find("\n", m.start())
        line = hlo_text[m.start():eol if eol != -1 else len(hlo_text)]
        group_size = 0  # unknown/all-devices/permute -> 'other' bucket
        gm = re.search(r"replica_groups=\{\{([\d,]+)\}", line)
        if gm:
            group_size = gm.group(1).count(",") + 1
        else:
            gm = re.search(r"replica_groups=\[([\d,]+)\]<=\[", line)
            if gm:
                group_size = int(gm.group(1).split(",")[-1])
        total = 0
        for shp in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
            dt, dims = shp
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes.get(dt, 4)
        if kind == "reduce-scatter" and group_size:
            total *= group_size
        ops.append({"kind": kind, "bytes": total, "group_size": group_size})
    model_ops = [o for o in ops if o["group_size"] == model_group_size]
    other_ops = [o for o in ops if o["group_size"] != model_group_size]
    return {
        "model_axis_collectives": len(model_ops),
        "model_axis_bytes": sum(o["bytes"] for o in model_ops),
        "model_axis_kinds": sorted({o["kind"] for o in model_ops}),
        "other_collectives": len(other_ops),
        "other_bytes": sum(o["bytes"] for o in other_ops),
    }


def _param_bytes_per_device(state, mesh):
    """Bytes one device holds: per-leaf shard size (replicated = full copy)."""
    import jax
    import numpy as np

    total = 0
    for leaf in jax.tree.leaves(state.params):
        shard = leaf.sharding.shard_shape(leaf.shape)
        total += int(np.prod(shard, dtype=np.int64)) * leaf.dtype.itemsize
    return total


def bench_model(arch: str, batch_size: int = 64, model_axis: int = 2,
                steps: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepipr_tpu.models import ResNet18Private, ResNet50Private
    from deepipr_tpu.parallel import (
        count_model_sharded,
        make_mesh,
        replicate,
        shard_batch,
        shard_model_parallel,
    )
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import (
        construct_passport_kwargs,
        load_passport_config,
    )

    cfg_file = {"resnet18": "passport_configs/resnet18_passport.json",
                "resnet50": "passport_configs/resnet50_passport.json"}[arch]
    factory = {"resnet18": ResNet18Private,
               "resnet50": ResNet50Private}[arch]
    cfg = load_passport_config(cfg_file)
    kwargs, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = factory(num_classes=10, passport_kwargs=kwargs)

    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=True)
    host = TrainState.create(variables, sgd_optimizer(0.01))
    host = jax.tree.map(np.asarray, host)

    rng = np.random.default_rng(0)
    batch = {"image": rng.normal(size=(batch_size, 32, 32, 3)).astype(np.float32),
             "label": rng.integers(0, 10, batch_size).astype(np.int32)}

    mesh = make_mesh(model_axis=model_axis)
    raw_step = make_train_step(model, private=True, jit=False)
    sb = shard_batch(batch, mesh)

    out = {"arch": arch, "batch_size": batch_size,
           "mesh": f"{mesh.devices.shape[0]}x{mesh.devices.shape[1]}"}
    for mode in ("replicated", "tp"):
        place = replicate if mode == "replicated" else shard_model_parallel
        st = place(jax.tree.map(jnp.asarray, host), mesh)
        step = jax.jit(raw_step)
        lowered = step.lower(st, sb)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        census = _collective_census(hlo, model_group_size=model_axis)
        st2, metrics = step(st, sb)
        float(metrics["loss"])  # materialize (compile + run)
        t0 = time.perf_counter()
        cur = st2
        for _ in range(steps):
            cur, metrics = step(cur, sb)
        loss = float(metrics["loss"])  # forces the chain
        dt = (time.perf_counter() - t0) / steps
        out[mode] = {
            "n_model_sharded_params": count_model_sharded(st.params),
            "param_bytes_per_device": _param_bytes_per_device(st, mesh),
            "step_ms": round(dt * 1e3, 2),
            "loss": round(loss, 6),
            **census,
        }
    out["loss_match"] = abs(out["replicated"]["loss"] - out["tp"]["loss"]) < 1e-3
    return out


def main():
    # Force the virtual 8-device CPU mesh BEFORE first backend use: the
    # axon sitecustomize pins the platform to the (single-device) TPU
    # relay, so env vars alone don't work and grabbing the TPU grant here
    # would both crash make_mesh and contend with real TPU jobs.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = [bench_model("resnet18"), bench_model("resnet50")]
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
