"""Result aggregation: scrape `results {...}` lines from run logs and
report mean/std/CI95 across seed directories.

Rebuild of the reference's log-scraping harness
(scripts/parse_test_res.py:1-174 and scripts/read_record.py:50-96),
which depends on the exact `results {...}` print format our trainer
preserves (mvlpt.py:1062, 1083).

Usage:
    python -m mvlpt_tpu.cli.parse_test_res <run_dir>            # one run
    python -m mvlpt_tpu.cli.parse_test_res <dir> --multi-exp    # seed dirs
    python -m mvlpt_tpu.cli.parse_test_res <root> --grid \\
        --datasets cifar-10,mnist --setting vit_b16_5shots/nctx16_csc_ctp \\
        --seeds 1,2,3 --out grid.csv                # dataset x seed CSV

Grid mode mirrors read_record.py:50-96's sweep artifact: one CSV with
a header row of dataset names and one row per seed, scraping
``<root>/<dataset>/<setting>/seed<seed>/log.txt*`` with missing-run
tolerance (blank cell + a "missed" note, like read_record.py:88-93 —
its plotting flows consume exactly this shape).
"""

from __future__ import annotations

import argparse
import ast
import csv
import glob as _glob
import math
import os
import re

_RESULTS_RE = re.compile(r"^results (\{.*\})\s*$")


def parse_log(fpath: str) -> list[dict]:
    """All `results {...}` dicts in a log, in order."""
    out = []
    with open(fpath, errors="replace") as f:
        for line in f:
            m = _RESULTS_RE.match(line.strip())
            if m:
                try:
                    out.append(ast.literal_eval(m.group(1)))
                except (ValueError, SyntaxError):
                    pass
    return out


def final_metrics(directory: str) -> dict | None:
    fpath = os.path.join(directory, "log.txt")
    if not os.path.exists(fpath):
        return None
    all_results = parse_log(fpath)
    return all_results[-1] if all_results else None


def aggregate(dirs: list[str]) -> dict:
    rows = [r for d in dirs if (r := final_metrics(d)) is not None]
    if not rows:
        return {}
    keys = set(rows[0])
    for r in rows[1:]:
        keys &= set(r)
    out = {}
    for k in sorted(keys):
        vals = [float(r[k]) for r in rows]
        n = len(vals)
        mean = sum(vals) / n
        std = math.sqrt(sum((v - mean) ** 2 for v in vals) / n) if n > 1 else 0.0
        ci95 = 1.96 * std / math.sqrt(n) if n > 1 else 0.0
        out[k] = {"mean": mean, "std": std, "ci95": ci95, "n": n}
    return out


def _pick_metric(results: dict, keyword: str | None):
    """One scalar from a results dict: the requested key, else the
    conventional accuracy keys, else the only key (read_record takes
    the first float on the results line — same outcome for the
    single-metric logs it scrapes)."""
    for k in ([keyword] if keyword else []) + ["accuracy", "average"]:
        if k in results:
            return float(results[k])
    if len(results) == 1:
        return float(next(iter(results.values())))
    return None


def grid_cell(root: str, dataset: str, setting: str, seed: str,
              keyword: str | None):
    """Final metric for one (dataset, seed) run, or None if the run is
    missing/unfinished — read_record.py:69-88 semantics (glob log.txt*
    so rotated/suffixed logs count; last results line wins)."""
    pattern = os.path.join(root, dataset, setting, f"seed{seed}", "log.txt*")
    for log_file in sorted(_glob.glob(pattern)):
        results = parse_log(log_file)
        if results:
            val = _pick_metric(results[-1], keyword)
            if val is not None:
                return val
    return None


def grid_rows(root: str, datasets: list[str], setting: str,
              seeds: list[str], keyword: str | None = None):
    """read_record's dataset x seed sweep: header row + one row per
    seed; missing runs become blank cells (returned with the miss
    list so callers can report them)."""
    rows = [[" "] + list(datasets)]
    missed = []
    for seed in seeds:
        row = [f"seed {seed}"]
        for ds in datasets:
            val = grid_cell(root, ds, setting, seed, keyword)
            if val is None:
                row.append(" ")
                missed.append((ds, seed))
            else:
                row.append(val)
        rows.append(row)
    return rows, missed


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--multi-exp", action="store_true",
                   help="directory contains one subdir per seed/run")
    p.add_argument("--keyword", default=None,
                   help="only report this metric key")
    p.add_argument("--grid", action="store_true",
                   help="dataset x seed CSV sweep (read_record.py mode); "
                        "directory is the checkpoint root")
    p.add_argument("--datasets", default="",
                   help="grid mode: comma-separated dataset dir names")
    p.add_argument("--setting", default="",
                   help="grid mode: run subpath under each dataset, e.g. "
                        "vit_b16_5shots/nctx16_csc_ctp")
    p.add_argument("--seeds", default="1,2,3",
                   help="grid mode: comma-separated seeds")
    p.add_argument("--out", default="",
                   help="grid mode: output CSV path (default: stdout)")
    args = p.parse_args()

    if args.grid:
        if not args.datasets:
            p.error("--grid requires --datasets")
        datasets = [d for d in args.datasets.split(",") if d]
        seeds = [s for s in args.seeds.split(",") if s]
        rows, missed = grid_rows(args.directory, datasets, args.setting,
                                 seeds, args.keyword)
        for ds, seed in missed:
            print("missed", ds, "seed", seed)
        if args.out:
            with open(args.out, "w", newline="", encoding="UTF8") as f:
                csv.writer(f).writerows(rows)
            print(f"wrote {args.out}")
        else:
            for row in rows:
                print(",".join(str(c) for c in row))
        print(f"okay we missed {len(missed)} entries")
        return

    if args.multi_exp:
        dirs = sorted(
            os.path.join(args.directory, d) for d in os.listdir(args.directory)
            if os.path.isdir(os.path.join(args.directory, d)))
    else:
        dirs = [args.directory]
    print(f"Parsing {len(dirs)} run dir(s)")
    for d in dirs:
        r = final_metrics(d)
        print(f"  {d}: {r}")
    summary = aggregate(dirs)
    print("===")
    print("Summary of directory:", args.directory)
    for k, s in summary.items():
        if args.keyword and k != args.keyword:
            continue
        print(f"* {k}: {s['mean']:.2f}% +- {s['ci95']:.2f}% "
              f"(std {s['std']:.2f}, n={s['n']})")


if __name__ == "__main__":
    cli()
