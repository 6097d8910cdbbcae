"""Result aggregation: scrape `results {...}` lines from run logs and
report mean/std/CI95 across seed directories.

Rebuild of the reference's log-scraping harness
(scripts/parse_test_res.py:1-174 and scripts/read_record.py:50-96),
which depends on the exact `results {...}` print format our trainer
preserves (mvlpt.py:1062, 1083).

Usage:
    python -m mvlpt_tpu.cli.parse_test_res <run_dir>            # one run
    python -m mvlpt_tpu.cli.parse_test_res <dir> --multi-exp    # seed dirs
"""

from __future__ import annotations

import argparse
import ast
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


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--multi-exp", action="store_true",
                   help="directory contains one subdir per seed/run")
    p.add_argument("--keyword", default=None,
                   help="only report this metric key")
    args = p.parse_args()

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
