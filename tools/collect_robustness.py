"""Assemble ROBUSTNESS.md from the attack-grid CSVs (VERDICT r2 item 6).

Reads the CSVs written by tools/run_robustness_grid.sh under
logs/{passport_attack_1,pruning_attack,flipping_attack,passport_attack_2,
passport_attack_3,passport_forge_attack}/<expname>/ and consolidates the
owner-vs-attacker story into one table per attack, replacing the scattered
docs/demo CSVs as the canonical robustness record.

Run: python tools/collect_robustness.py \
        --expname resnet_synthetic_v2_demo200/1 --tag 200 --out ROBUSTNESS.md
"""

from __future__ import annotations

import argparse
import csv
import glob
import os


USED_PATHS = []  # every CSV a rendered section cites


def read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def fnum(x, default=float("nan")):
    try:
        return float(x)
    except (TypeError, ValueError):
        return default


def backends_of(*row_lists):
    """Distinct backend stamps across CSV rows (cli_common writes a
    `backend` column per row since round 5) — rendered next to each
    Source line so provenance is in the committed record."""
    seen = sorted({r.get("backend") for rows in row_lists for r in rows
                   if r.get("backend") not in (None, "")})
    return f" (backend: {', '.join(seen)})" if seen else ""


def find(kind, expname, pattern="*.csv"):
    return sorted(glob.glob(os.path.join("logs", kind, expname, pattern)))


def section_attack1(expname, tag, lines):
    paths = find("passport_attack_1", expname, f"*-{tag}.csv")
    if not paths:
        return
    USED_PATHS.append(paths[-1])
    rows = read_csv(paths[-1])
    genuine = [r for r in rows if fnum(r["attack_rep"]) < 0]
    fakes = [r for r in rows if fnum(r["attack_rep"]) >= 0]
    accs = [fnum(r["valid_acc"]) for r in fakes]
    signs = [fnum(r["valid_signacc"]) for r in fakes]
    lines += [
        "## Attack 1 — random fake passports "
        f"({len(fakes)} reps; reference passport_attack_1.py)",
        "",
        "| | private acc | sign acc |",
        "|---|---|---|",
        f"| genuine passport | {fnum(genuine[0]['valid_acc']):.2f}% "
        f"| {fnum(genuine[0]['valid_signacc']) * 100:.2f}% |",
        f"| fake (mean over reps) | {sum(accs) / len(accs):.2f}% "
        f"| {100 * sum(signs) / len(signs):.2f}% |",
        f"| fake (best for attacker) | {max(accs):.2f}% "
        f"| {100 * max(signs):.2f}% |",
        "",
        f"Source: `{paths[-1]}`{backends_of(rows)}",
        "",
    ]


def section_sweep(kind, title, expname, tag, lines, extra_cols=()):
    paths = find(kind, expname, f"*-{tag}.csv")
    if not paths:
        return
    USED_PATHS.append(paths[-1])
    rows = read_csv(paths[-1])
    cols = ["perc", "acc", "detect_mean", *extra_cols]
    # V3 grids carry black-box WM accuracy per row (attacks/*.py wm_data)
    cols += [c for c in ("wm_acc", "wm_acc_private")
             if rows and rows[0].get(c) not in (None, "")]
    lines += [f"## {title}", "", "| " + " | ".join(cols) + " |",
              "|" + "---|" * len(cols)]
    for r in rows:
        vals = []
        for c in cols:
            v = fnum(r.get(c))
            vals.append(f"{v * 100:.1f}%" if c == "detect_mean"
                        else f"{v:.2f}")
        lines.append("| " + " | ".join(vals) + " |")
    lines += ["", f"Source: `{paths[-1]}`{backends_of(rows)}", ""]


def section_retrain(kind, title, expname, tag, lines, acc_col="valid_acc",
                    sig_cols=("similarity",)):
    paths = find(kind, expname, f"*{tag}-*.csv")
    if not paths:
        return
    lines += [f"## {title}", ""]
    USED_PATHS.extend(paths)
    by_path = [(p, read_csv(p)) for p in paths]  # read each CSV once
    # probe EVERY per-flipperc CSV: a grid can straddle the wm-column
    # change (older legs without wm_acc, re-run legs with it) and the
    # column must render for whichever rows have data
    has_wm = any(r.get("wm_acc") not in (None, "")
                 for _, rows in by_path for r in rows)
    header = ["flipperc", "final attacker acc", *sig_cols]
    if has_wm:
        header.append("final wm acc")
    lines += ["| " + " | ".join(header) + " |", "|" + "---|" * len(header)]
    for p, rows in by_path:
        fp = os.path.splitext(p)[0].rsplit("-", 1)[-1]
        final = rows[-1]
        vals = [fp, f"{fnum(final.get(acc_col)):.2f}%"]
        for c in sig_cols:
            cands = [fnum(r.get(c)) for r in rows
                     if r.get(c) not in (None, "")]
            vals.append(f"{cands[-1]:.4f}" if cands else "—")
        if has_wm:
            cands = [fnum(r.get("wm_acc")) for r in rows
                     if r.get("wm_acc") not in (None, "")]
            vals.append(f"{cands[-1]:.2f}%" if cands else "—")
        lines.append("| " + " | ".join(vals) + " |")
    lines += ["", "Sources: " + ", ".join(f"`{p}`" for p in paths)
              + backends_of(*[rows for _, rows in by_path]), ""]


def section_forge(expname, tag, lines):
    paths = find("passport_forge_attack", expname, f"*-{tag}.csv")
    if not paths:
        return
    USED_PATHS.append(paths[-1])
    rows = read_csv(paths[-1])
    lines += [
        "## Forge attack (beyond reference) — passports from scratch, "
        "no data",
        "",
        "| flipperc | forged acc | owner acc | forged sign acc (vs "
        "attacker's b) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {fnum(r['flipperc']):.2f} "
            f"| {fnum(r['valid_acc_forged']):.2f}% "
            f"| {fnum(r['valid_acc_owner']):.2f}% "
            f"| {100 * fnum(r['forged_signacc_vs_attacker_b']):.2f}% |")
    lines += ["", f"Source: `{paths[-1]}`{backends_of(rows)}", ""]


def section_transfer(expname, lines):
    """Transfer-learning survival: fine-tune a surgically cloned normal
    model (train/transfer.py, reference classification_private.py:161-330)
    and track per-epoch signature bit-acc + trigger-set accuracy through
    the ORIGINAL model. TL runs live in their own expdirs
    logs/<base><tag>tl{rtal,ftal}/<id>/tl_1/history.csv."""
    base = expname.split("/")[0]
    paths = sorted(glob.glob(
        os.path.join("logs", f"{base}tl*", "*", "tl_1", "history.csv")))
    if not paths:
        return
    USED_PATHS.extend(paths)
    lines += [
        "## Transfer-learning attack — fine-tune a cloned normal model "
        "(reference classification_private.py:161-330)",
        "",
        "| scheme | TL valid acc | signature bit-acc after TL (min over "
        "passport layers) | trigger-set acc after TL (total) |",
        "|---|---|---|---|",
    ]
    for p in paths:
        tl_scheme = "rtal" if "tlrtal" in p else (
            "ftal" if "tlftal" in p else "?")
        rows = read_csv(p)
        final = rows[-1]
        sig = [fnum(v) for k, v in final.items()
               if k.startswith("old_wm_passport_") and v not in (None, "")]
        sigcell = f"{100 * min(sig):.2f}%" if sig else "—"
        wm = final.get("backdoor_total_acc")
        wmcell = f"{fnum(wm):.2f}%" if wm not in (None, "") else "—"
        lines.append(f"| {tl_scheme} | {fnum(final.get('valid_acc')):.2f}% "
                     f"| {sigcell} | {wmcell} |")
    lines += ["", "Sources: " + ", ".join(f"`{p}`" for p in paths), ""]


def add_model_sections(expname, tag, lines):
    section_attack1(expname, tag, lines)
    section_sweep("pruning_attack", "Pruning attack — global percentile "
                  "sweep (reference pruning_attack.py)", expname,
                  tag, lines)
    section_sweep("flipping_attack", "Sign-flip attack — flip the largest "
                  "|scale| signs (reference flip_attack.py)", expname,
                  tag, lines, extra_cols=("similarity",))
    section_retrain("passport_attack_2", "Attack 2 — reverse-engineer "
                    "scale/bias, 100 retrain epochs (reference "
                    "passport_attack_2.py)", expname, tag, lines)
    section_retrain("passport_attack_3", "Attack 3 — ambiguity attack, 100 "
                    "epochs (reference passport_attack_3.py)", expname,
                    tag, lines,
                    sig_cols=("train_signacc", "cosine_similarity"))
    section_forge(expname, tag, lines)
    section_transfer(expname, lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--expname", action="append", default=None,
                    help="repeatable; each adds a model section")
    ap.add_argument("--tag", default="200")
    ap.add_argument("--out", default="ROBUSTNESS.md")
    ap.add_argument("--header", default=None,
                    help="extra context line (checkpoint, hardware)")
    ap.add_argument("--copy-src-to", default=None, metavar="DIR",
                    help="mirror every cited source CSV into DIR (layout "
                    "logs/<kind>/<expname>/... -> DIR/<kind>/<expname>/...) "
                    "so the gitignored logs/ tree has a committed copy")
    args = ap.parse_args()
    expnames = args.expname or ["resnet_synthetic_v2_demo200/1"]

    lines = [
        "# ROBUSTNESS — full attack grid at canonical scale",
        "",
        "Attack grid of the reference (attacking.sh + "
        "passport_attack_{1,2,3}.py, pruning_attack.py, flip_attack.py) "
        "plus this repo's forge attack, run against the "
        "200-epoch canonical checkpoints ("
        + ", ".join(f"`logs/{e}`" for e in expnames) + "). "
        "Regenerate: `bash tools/run_robustness_grid.sh` then "
        "`python tools/collect_robustness.py`. Committed copies of every "
        "source CSV: `docs/demo/robustness_grid/` (the logs/ tree is "
        "gitignored).",
        "",
        "**Caveat — synthetic, memorizable task (applies to EVERY table "
        "below).** All numbers are measured on the offline 2048-image "
        "synthetic dataset (real CIFAR is blocked by the zero-egress "
        "environment; BASELINE.md). A task this small is memorizable, so "
        "retraining attacks (attack 2/3, data-refined forge) can fully "
        "recover task accuracy here — the OPPOSITE of the reference's "
        "CIFAR-10 narrative, where they degrade the model. These grids "
        "prove the attack machinery end-to-end and bound nothing about "
        "real-data robustness; real-data parity is one command once "
        "archives land (docs/MIGRATION.md).",
        "",
    ]
    if args.header:
        lines += [args.header, ""]

    for expname in expnames:
        if len(expnames) > 1:
            lines += [f"# {expname.split('/')[0]}", ""]
        add_model_sections(expname, args.tag, lines)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(lines)} lines)")

    if args.copy_src_to:
        import shutil

        for p in sorted(set(USED_PATHS)):
            rel = os.path.relpath(p, "logs")
            dest = os.path.join(args.copy_src_to, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.copy2(p, dest)
        print(f"copied {len(set(USED_PATHS))} source CSVs "
              f"to {args.copy_src_to}")


if __name__ == "__main__":
    main()
