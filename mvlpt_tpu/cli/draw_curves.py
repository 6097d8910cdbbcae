"""Few-shot accuracy curve plots (rebuild of scripts/draw_curves.py):
reads aggregated results (csv or parse_test_res output dirs) and plots
accuracy vs shots per method."""

from __future__ import annotations

import argparse
import os


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True,
                   help="csv with columns: method,dataset,shots,accuracy")
    p.add_argument("--output-dir", default="./figs")
    args = p.parse_args()

    import csv
    from collections import defaultdict

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(csv.DictReader(open(args.csv)))
    by_dataset = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_dataset[r["dataset"]][r["method"]].append(
            (int(r["shots"]), float(r["accuracy"])))

    os.makedirs(args.output_dir, exist_ok=True)
    for dataset, methods in by_dataset.items():
        fig, ax = plt.subplots(figsize=(4, 3))
        for method, pts in sorted(methods.items()):
            pts.sort()
            ax.plot([s for s, _ in pts], [a for _, a in pts],
                    marker="o", label=method)
        ax.set_xscale("log", base=2)
        ax.set_xlabel("shots per class")
        ax.set_ylabel("accuracy (%)")
        ax.set_title(dataset)
        ax.legend(fontsize=7)
        fig.tight_layout()
        out = os.path.join(args.output_dir, f"{dataset}_curve.png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")


if __name__ == "__main__":
    cli()
