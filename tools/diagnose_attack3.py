"""Root-cause the cross-stack attack-3 asymmetry (VERDICT r4 item 3).

Observed at study scale (docs/demo/cross_stack_attacks.json): the jax-trained
V2 AlexNet is fully ambiguity-attackable (100% acc / 100% sign acc, flipperc
0) while the torch-trained one resists (56-74% acc, ~89% sign acc) — in BOTH
attack stacks, i.e. a property of the checkpoint, not of the attack code.

This harness isolates why, with three probes per checkpoint (the torch
checkpoint is imported into jax — bit-exact per tests/test_torch_export.py —
so one analysis path serves both):

  1. **Derived-affine geometry** — per passport layer: |scale| percentiles
     and the sign-loss hinge margin scale*b (reference SignLoss,
     sign_loss.py:5-23: hinge at 0.1). A checkpoint whose margins hug the
     hinge is one whose signs flip under small passport perturbations.
  2. **Passport noise sensitivity** — private-branch accuracy and
     derived-scale sign-flip fraction vs N(0, sigma) key noise, sigma swept
     through the attack's 0.001 starting perturbation
     (reference passport_attack_3.py:229-232).
  3. **Passport transplant** — retrain each stack with the OTHER stack's
     key/skey selection. If attackability follows the keys, the asymmetry is
     key-draw provenance (each stack samples its own 20 candidate images);
     if it follows the stack, it is a trainer-semantics difference.

Plus a seed sweep of the NATIVE attack-3 cells (torch-on-torch,
jax-on-jax): does resistance flip with the key draw?

Run: python tools/diagnose_attack3.py --out docs/demo  (CPU, ~45 min)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cross_stack_attacks import _batches, jax_attack3, torch_attack3  # noqa: E402
from cross_stack_parity import (  # noqa: E402
    ALEXNET_CFG,
    make_shared_data,
    run_jax,
    run_torch,
)

PLKEYS = [k for k, flag in ALEXNET_CFG.items() if flag]  # '4','5','6'
SIGMAS = (1e-4, 3e-4, 1e-3, 3e-3, 1e-2)


def _to_jax(sd):
    """Torch V2 AlexNet state dict -> (model, TrainState) here."""
    import jax
    import jax.numpy as jnp

    from deepipr_tpu.interop.torch_import import import_torch_checkpoint
    from deepipr_tpu.models import AlexNet
    from deepipr_tpu.train import TrainState, sgd_optimizer
    from deepipr_tpu.utils.config import construct_passport_kwargs

    kw, _ = construct_passport_kwargs(ALEXNET_CFG, "bn", "shuffle", 0.1)
    model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    tmpl = model.init({"params": jax.random.key(0),
                       "passport": jax.random.key(1)},
                      jnp.zeros((2, 32, 32, 3)), train=True)
    variables = import_torch_checkpoint(sd, tmpl, strict=True)
    return model, TrainState.create(variables, sgd_optimizer(0.01))


def geometry(model, state):
    """Per-layer |scale| percentiles + hinge margins scale*b."""
    import numpy as np

    from deepipr_tpu.attacks.common import derived_affines

    affines = derived_affines(model, state.model_variables(),
                              (1, 32, 32, 3), True)
    out = {}
    for path, aux in affines.items():
        scale = np.asarray(aux["scale"]).ravel()
        b = np.asarray(aux["b"]).ravel()
        margin = scale * b  # sign-loss hinge is max(0, 0.1 - scale*b)
        out[path] = {
            "abs_scale_mean": float(np.mean(np.abs(scale))),
            "abs_scale_min": float(np.min(np.abs(scale))),
            "abs_scale_p10": float(np.percentile(np.abs(scale), 10)),
            "margin_mean": float(np.mean(margin)),
            "margin_min": float(np.min(margin)),
            "margin_frac_below_hinge": float(np.mean(margin < 0.1)),
        }
    return out


def noise_sensitivity(model, state, valid_b, seed=0, sigmas=SIGMAS):
    """Private acc + derived-scale sign-flip fraction vs passport noise."""
    import jax
    import numpy as np

    from deepipr_tpu.attacks.common import derived_affines
    from deepipr_tpu.train.steps import make_eval_step, run_eval

    eval_step = make_eval_step(model, ind=1)
    base_aff = derived_affines(model, state.model_variables(),
                               (1, 32, 32, 3), True)
    base_signs = {p: np.sign(np.asarray(a["scale"]).ravel())
                  for p, a in base_aff.items()}

    pp = jax.device_get(state.passport)
    leaves, treedef = jax.tree.flatten(pp)
    rng = np.random.default_rng(seed)
    rows = []
    for sigma in sigmas:
        noisy = treedef.unflatten([
            x + rng.normal(0, sigma, x.shape).astype(np.float32)
            for x in leaves
        ])
        st = state.replace(passport=noisy)
        acc = run_eval(eval_step, st, valid_b)["acc"]
        aff = derived_affines(model, st.model_variables(), (1, 32, 32, 3),
                              True)
        flips = np.concatenate([
            np.sign(np.asarray(aff[p]["scale"]).ravel()) != base_signs[p]
            for p in base_signs
        ])
        rows.append({"sigma": sigma, "private_acc": float(acc),
                     "scale_sign_flip_frac": float(np.mean(flips))})
    return rows


def torch_keys_as_jax(sd):
    """{plkey: (key, skey)} NHWC from a torch state dict."""
    import numpy as np

    out = {}
    for k in PLKEYS:
        key = sd[f"features.{k}.key_private"].detach().numpy()
        skey = sd[f"features.{k}.skey_private"].detach().numpy()
        out[k] = (np.ascontiguousarray(key.transpose(0, 2, 3, 1)),
                  np.ascontiguousarray(skey.transpose(0, 2, 3, 1)))
    return out


def jax_passports_from(keys_nhwc, template_pp):
    """Build a passport collection from {plkey: (key, skey)} NHWC."""
    import jax.numpy as jnp

    pp = dict(template_pp)
    for k, (key, skey) in keys_nhwc.items():
        pp[f"features_{k}"] = {"key": jnp.asarray(key),
                               "skey": jnp.asarray(skey)}
    return pp


def torch_override_from_jax(jstate):
    """key_override(model) hook copying the jax run's passports into the
    torch modules (NHWC -> NCHW)."""
    import jax
    import numpy as np

    pp = jax.device_get(jstate.passport)

    def override(model):
        import torch

        for k in PLKEYS:
            leaf = pp[f"features_{k}"]
            for name, arr in (("key_private", leaf["key"]),
                              ("skey_private", leaf["skey"])):
                t = torch.from_numpy(np.ascontiguousarray(
                    np.asarray(arr).transpose(0, 3, 1, 2)))
                getattr(model.features[int(k)], name).data.copy_(t)

    return override


def analyze(tag, model, state, data, attack_epochs, seed, batch_size,
            native_attack):
    xtr, ytr, xte, yte = data
    valid_b = _batches(xte, yte.astype("int32"), batch_size)
    res = {
        "geometry": geometry(model, state),
        "noise_sensitivity": noise_sensitivity(model, state, valid_b,
                                               seed=seed),
    }
    t0 = time.time()
    res["attack3"] = native_attack()
    res["attack3"]["seconds"] = round(time.time() - t0, 1)
    print(json.dumps({tag: res}, indent=None), flush=True)
    return res


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--train-epochs", type=int, default=15)
    ap.add_argument("--attack-epochs", type=int, default=15)
    ap.add_argument("--num-train", type=int, default=1024)
    ap.add_argument("--num-test", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--skip-transplant", action="store_true")
    ap.add_argument("--out", default="docs/demo")
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    bs, ae = args.batch_size, args.attack_epochs
    results = {"per_seed": {}, "transplant": {}}

    for seed in seeds:
        data = make_shared_data(args.num_train, args.num_test, seed)
        tres = run_torch(data, args.train_epochs, bs, 1, 5, seed)
        jres = run_jax(data, args.train_epochs, bs, 1, 5, seed)
        tmodel = tres["_model"]
        jmodel, jstate = jres["_model"], jres["_state"]
        sd = tmodel.state_dict()
        tjmodel, tjstate = _to_jax(sd)

        kw = dict(flipperc=0.0, seed=seed, batch_size=bs)
        results["per_seed"][seed] = {
            "torch_ckpt": analyze(
                f"torch_ckpt/seed{seed}", tjmodel, tjstate, data, ae, seed,
                bs, lambda: torch_attack3(sd, data, ae, **kw)),
            "jax_ckpt": analyze(
                f"jax_ckpt/seed{seed}", jmodel, jstate, data, ae, seed, bs,
                lambda: jax_attack3(jmodel, jstate, data, ae, **kw)),
        }

        if seed == seeds[0] and not args.skip_transplant:
            # jax training with the torch run's exact passports
            tkeys = torch_keys_as_jax(sd)
            jres_t = run_jax(
                data, args.train_epochs, bs, 1, 5, seed,
                passports=jax_passports_from(
                    tkeys, jax.device_get(jstate.passport)))
            jm_t, js_t = jres_t["_model"], jres_t["_state"]
            results["transplant"]["jax_with_torch_keys"] = analyze(
                "jax_with_torch_keys", jm_t, js_t, data, ae, seed, bs,
                lambda: jax_attack3(jm_t, js_t, data, ae, **kw))

            # torch training with the jax run's exact passports
            tres_j = run_torch(data, args.train_epochs, bs, 1, 5, seed,
                               key_override=torch_override_from_jax(jstate))
            sd_j = tres_j["_model"].state_dict()
            m_j, s_j = _to_jax(sd_j)
            results["transplant"]["torch_with_jax_keys"] = analyze(
                "torch_with_jax_keys", m_j, s_j, data, ae, seed, bs,
                lambda: torch_attack3(sd_j, data, ae, **kw))

    results["recipe"] = {
        "arch": "alexnet", "scheme": 2, "train_epochs": args.train_epochs,
        "attack_epochs": ae, "num_train": args.num_train,
        "num_test": args.num_test, "batch_size": bs, "seeds": seeds,
        "flipperc": 0.0, "noise_sigmas": list(SIGMAS),
    }
    if args.out.endswith(".json"):  # full output path (e.g. an epochs-sweep variant)
        path = args.out
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    else:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "attack3_asymmetry.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
