"""Milestone-accuracy runbook: one command per BASELINE.json config.

Runs the five reference milestone configs end-to-end and writes the
measured numbers into BASELINE.md (between the MILESTONE_RESULTS
markers). Each milestone mirrors the reference workflow
(MVLPT.md:29-55, scripts/mvlpt/*.sh):

  1  zero-shot CLIP ViT-B/32 on Caltech101    (zeroshot.sh)
  2  CoOp 16-shot oxford_pets, ViT-B/32       (main_single_coopdata_cut.sh)
  3  VPT dtd + eurosat, ViT-B/16              (main_single_coopdata_cut.sh)
  4  11-task multitask UPT source, ViT-B/16   (main_mt_coopdata_cut.sh)
  5  ELEVATER 20-task transfer from the #4 prompt (avg_ckpt over seeds)
     + lpclip RN50 linear probe               (main_single_elevater_cut.sh,
                                               lpclip/)

Prerequisites (the run FAILS LOUDLY with instructions when absent):
  * CLIP weights: cached under ~/.cache/clip (ViT-B/32.pt, ViT-B/16.pt,
    RN50.pt from the OpenAI CDN — URLs in
    mvlpt_tpu/checkpoint/convert.py:OPENAI_MODELS) or a single-model
    override via MVLPT_TPU_CLIP_CKPT.
  * CoOp data root (--coop-root / $DATA): the 11 CoOp datasets laid out
    per docs/DATASETS.md.
  * ELEVATER manifest root (--elevater-root): local manifests, built
    with `python -m mvlpt_tpu.cli.build_manifest` (hub dumps convert
    directly).

Usage:
    python scripts/milestones.py --coop-root /data/coop \
        --elevater-root /data/elevater [--only 1,2] [--seeds 1,2,3]
        [--epochs-override N] [--dry-run]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COOP_11 = ("ImageNet,Caltech101,Food101,StanfordCars,OxfordPets,"
           "OxfordFlowers,FGVCAircraft,SUN397,DescribableTextures,"
           "EuroSAT,UCF101")

BEGIN = "<!-- MILESTONE_RESULTS:BEGIN (scripts/milestones.py writes this) -->"
END = "<!-- MILESTONE_RESULTS:END -->"


def _fail(msg: str):
    sys.exit(f"\nMILESTONE PREFLIGHT FAILED\n{'=' * 26}\n{msg}\n")


def preflight_weights(backbones: set[str]):
    from mvlpt_tpu.checkpoint.convert import OPENAI_MODELS

    if os.environ.get("MVLPT_TPU_RANDOM_CLIP"):
        print("warning: MVLPT_TPU_RANDOM_CLIP=1 — numbers will be "
              "random-weight smoke values, not milestones")
        return
    env = os.environ.get("MVLPT_TPU_CLIP_CKPT")
    if env:
        if not os.path.exists(env):
            _fail(f"MVLPT_TPU_CLIP_CKPT={env} does not exist")
        if len(backbones) > 1:
            print(f"warning: MVLPT_TPU_CLIP_CKPT overrides ALL of "
                  f"{sorted(backbones)} with one file")
        return
    cache = os.path.expanduser("~/.cache/clip")
    missing = [b for b in sorted(backbones)
               if not os.path.isfile(
                   os.path.join(cache, os.path.basename(OPENAI_MODELS[b])))]
    if missing:
        lines = [f"CLIP weights missing for {missing}.",
                 f"Place the OpenAI checkpoints under {cache}/:"]
        for b in missing:
            lines.append(f"  curl -o {cache}/{os.path.basename(OPENAI_MODELS[b])} "
                         f"{OPENAI_MODELS[b]}")
        lines.append("or set MVLPT_TPU_CLIP_CKPT=/path/to/model.pt "
                     "(single-model runs only).")
        _fail("\n".join(lines))


def preflight_root(root: str | None, what: str, hint: str):
    if not root:
        _fail(f"{what} not given. {hint}")
    if not os.path.isdir(root):
        _fail(f"{what} {root!r} is not a directory. {hint}")
    return root


def run(cmd: list[str], dry: bool) -> None:
    print("+ " + " ".join(cmd), flush=True)
    if dry:
        return
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        sys.exit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def train_cmd(out, extra):
    return [sys.executable, "train.py", "--output-dir", out, *extra]


def seed_dirs(base: str, seeds) -> list[str]:
    return [os.path.join(base, f"seed{s}") for s in seeds]


def collect(base: str, seeds, key_hint=None) -> dict:
    """Aggregate final `results {...}` across seed dirs."""
    from mvlpt_tpu.cli.parse_test_res import aggregate

    agg = aggregate(seed_dirs(base, seeds))
    if not agg:
        return {}
    if key_hint and key_hint in agg:
        return {key_hint: agg[key_hint]}
    return agg


def headline(agg: dict) -> str:
    if not agg:
        return "no results parsed"
    for k in ("accuracy", "average", "mean_per_class", "roc_auc", "11point_mAP"):
        if k in agg:
            v = agg[k]
            return f"{k} {v['mean']:.2f} ± {v['ci95']:.2f} (n={v['n']})"
    k, v = next(iter(agg.items()))
    return f"{k} {v['mean']:.2f} ± {v['ci95']:.2f} (n={v['n']})"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coop-root", default=os.environ.get("DATA", ""))
    p.add_argument("--elevater-root",
                   default=os.environ.get("MVLPT_TPU_ELEVATER_ROOT", ""))
    p.add_argument("--out", default="output/milestones")
    p.add_argument("--seeds", default="1,2,3")
    p.add_argument("--only", default="1,2,3,4,5")
    p.add_argument("--epochs-override", type=int, default=0,
                   help="cap OPTIM.MAX_EPOCH for smoke runs (0 = reference "
                        "schedule: 200 epochs)")
    p.add_argument("--elevater-tasks", default="",
                   help="comma list overriding the 20-task default")
    p.add_argument("--dry-run", action="store_true",
                   help="print every command without running")
    args = p.parse_args()

    seeds = [int(s) for s in args.seeds.split(",") if s]
    only = {int(s) for s in args.only.split(",") if s}
    dry = args.dry_run
    results: dict[int, str] = {}

    need_b32 = only & {1, 2}
    need_b16 = only & {3, 4, 5}
    backbones = set()
    if need_b32:
        backbones.add("ViT-B/32")
    if need_b16:
        backbones.add("ViT-B/16")
    if 5 in only:
        backbones.add("RN50")
    if not dry:
        preflight_weights(backbones)

    coop_hint = ("Pass --coop-root (or $DATA) pointing at the CoOp "
                 "datasets root (docs/DATASETS.md).")
    elev_hint = ("Pass --elevater-root pointing at local ELEVATER "
                 "manifests (python -m mvlpt_tpu.cli.build_manifest).")
    if only & {1, 2, 3, 4} and not dry:
        preflight_root(args.coop_root, "--coop-root", coop_hint)
    if 5 in only and not dry:
        preflight_root(args.elevater_root, "--elevater-root", elev_hint)

    ep = (["OPTIM.MAX_EPOCH", str(args.epochs_override)]
          if args.epochs_override else [])

    # ---- 1. zero-shot ViT-B/32 Caltech101 (zeroshot.sh) ----
    if 1 in only:
        out = os.path.join(args.out, "m1_zeroshot_caltech101")
        run(train_cmd(os.path.join(out, "seed1"), [
            "--root", args.coop_root, "--trainer", "ZeroshotCLIP",
            "--dataset-coop", "--dataset", "Caltech101", "--seed", "1",
            "--no-train", "--eval-only",
            "MODEL.BACKBONE.NAME", "ViT-B/32"]), dry)
        results[1] = headline(collect(out, [1]))

    # ---- 2. CoOp 16-shot oxford_pets ViT-B/32 ----
    if 2 in only:
        out = os.path.join(args.out, "m2_coop_pets")
        for s in seeds:
            run(train_cmd(os.path.join(out, f"seed{s}"), [
                "--root", args.coop_root, "--trainer", "CoOp",
                "--dataset-coop", "--dataset", "OxfordPets",
                "--seed", str(s), "--shots", "16", "--cut-contextlen",
                "--config-file", "configs/trainers/MVLPT/vit_b32.yaml",
                "TRAINER.COOP.N_CTX", "16",
                "TRAINER.COOP.CLASS_TOKEN_POSITION", "middle",
                "TEST.FINAL_MODEL", "best_val", *ep]), dry)
        results[2] = headline(collect(out, seeds))

    # ---- 3. VPT dtd + eurosat ViT-B/16 ----
    if 3 in only:
        lines = []
        for ds in ("DescribableTextures", "EuroSAT"):
            out = os.path.join(args.out, f"m3_vpt_{ds.lower()}")
            for s in seeds:
                run(train_cmd(os.path.join(out, f"seed{s}"), [
                    "--root", args.coop_root, "--trainer", "MVLPT",
                    "--dataset-coop", "--dataset", ds,
                    "--seed", str(s), "--shots", "16",
                    "--config-file", "configs/trainers/MVLPT/vit_b16.yaml",
                    "TRAINER.MVLPT.VPT.N_CTX", "16",
                    "TRAINER.MVLPT.COOP.N_CTX", "0",
                    "TEST.FINAL_MODEL", "best_val", *ep]), dry)
            lines.append(f"{ds}: {headline(collect(out, seeds))}")
        results[3] = "; ".join(lines)

    # ---- 4. 11-task multitask UPT source ViT-B/16 ----
    mt_out = os.path.join(args.out, "m4_mt_upt")
    if 4 in only:
        for s in seeds:
            run(train_cmd(os.path.join(mt_out, f"seed{s}"), [
                "--root", args.coop_root, "--trainer", "MVLPT",
                "--dataset-coop", "--multi-task", "--dataset", COOP_11,
                "--seed", str(s), "--shots", "16",
                "--cut-contextlen", "--act-ckpt", "4",
                "--config-file", "configs/trainers/MVLPT/vit_b16.yaml",
                "TRAINER.MVLPT.COOP.N_CTX", "4",
                "TRAINER.MVLPT.VPT.N_CTX", "4",
                "TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION", "middle",
                "TEST.FINAL_MODEL", "best_val", *ep]), dry)
        results[4] = headline(collect(mt_out, seeds, key_hint="average"))

    # ---- 5. ELEVATER transfer from #4 + lpclip ----
    if 5 in only:
        avg_dir = os.path.join(args.out, "m5_avg_ckpt")
        run([sys.executable, "-m", "mvlpt_tpu.cli.avg_ckpt",
             "--dirs", *seed_dirs(mt_out, seeds),
             "--output-dir", avg_dir], dry)
        tasks = (args.elevater_tasks.split(",") if args.elevater_tasks
                 else None)
        if tasks is None:
            from mvlpt_tpu.data.elevater.manifest import ELEVATER_20_TASKS
            tasks = ELEVATER_20_TASKS
        per_task = []
        for task in tasks:
            out = os.path.join(args.out, "m5_transfer", task)
            for s in seeds:
                run(train_cmd(os.path.join(out, f"seed{s}"), [
                    "--root", args.elevater_root, "--trainer", "MVLPT",
                    "--dataset", task, "--seed", str(s), "--shots", "16",
                    "--cut-contextlen",
                    "--model-dir", avg_dir,
                    "--config-file", "configs/trainers/MVLPT/vit_b16.yaml",
                    "TRAINER.MVLPT.COOP.N_CTX", "4",
                    "TRAINER.MVLPT.VPT.N_CTX", "4",
                    "TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION", "middle",
                    "TEST.FINAL_MODEL", "best_val", *ep]), dry)
            agg = collect(out, seeds)
            if agg:
                per_task.append(next(iter(agg.values()))["mean"])
        # lpclip two-stage (reference: lpclip/feat_extractor.py +
        # linear_probe.py, RN50 features, 10 runs x {1,2,4,8,16} shots)
        lp_out = os.path.join(args.out, "m5_lpclip")
        for task in tasks:
            feat_dir = os.path.join(lp_out, "features", task)
            run([sys.executable, "-m", "mvlpt_tpu.cli.lpclip",
                 "extract-features", "--root", args.elevater_root,
                 "--dataset", task, "--backbone", "RN50",
                 "--output-dir", feat_dir], dry)
            run([sys.executable, "-m", "mvlpt_tpu.cli.lpclip", "probe",
                 "--feature-dir", feat_dir, "--dataset", task,
                 "--report-dir", os.path.join(lp_out, "report")], dry)
        avg = (f"{sum(per_task) / len(per_task):.2f} over "
               f"{len(per_task)} tasks" if per_task else "no results parsed")
        results[5] = (f"20-task avg {avg}; lpclip report in "
                      f"{os.path.join(lp_out, 'report')}")

    write_baseline(results, dry)


def write_baseline(results: dict[int, str], dry: bool):
    if not results:
        return
    names = {
        1: "zero-shot ViT-B/32 Caltech101",
        2: "CoOp 16-shot oxford_pets ViT-B/32",
        3: "VPT ViT-B/16 dtd/eurosat",
        4: "11-task multitask UPT ViT-B/16",
        5: "ELEVATER 20-task transfer + lpclip",
    }
    block = [BEGIN, "", "| # | Milestone (BASELINE.json) | Measured |",
             "|---|---|---|"]
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    old = {}
    if BEGIN in text:
        for m in re.finditer(r"^\| (\d) \| .* \| (.*) \|$",
                             text.split(BEGIN)[1].split(END)[0], re.M):
            old[int(m.group(1))] = m.group(2)
    for i in range(1, 6):
        val = results.get(i, old.get(i, "—"))
        block.append(f"| {i} | {names[i]} | {val} |")
    block += ["", END]
    blob = "\n".join(block)
    for i, v in sorted(results.items()):
        print(f"milestone {i}: {v}")
    if dry:
        return
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        text = pre + blob + post
    else:
        text = text.rstrip() + "\n\n## Measured milestones\n\n" + blob + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
