"""Result-aggregation CLI: mean/std/CI95 across seeds and the
read_record grid sweep (round-4 verdict item 6).

Fixture trees mimic what the trainer writes: ``log.txt`` ending in a
``results {...}`` line (the contract of mvlpt.py:1062/1083 that
scripts/parse_test_res.py and read_record.py:50-96 scrape).
"""

import csv
import os
import sys

from mvlpt_tpu.cli.parse_test_res import (
    aggregate, final_metrics, grid_rows, parse_log)


def _write_log(d, value, key="accuracy", extra_lines=()):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "log.txt"), "w") as f:
        for line in extra_lines:
            f.write(line + "\n")
        f.write("Evaluate on the *test* set\n")
        f.write(f"results {{'{key}': {value}}}\n")


def test_parse_and_aggregate(tmp_path):
    for seed, acc in (("seed1", 60.0), ("seed2", 62.0), ("seed3", 64.0)):
        _write_log(tmp_path / seed, acc,
                   extra_lines=["results {'accuracy': 1.0}"])  # val epochs
    # last results line wins (final test), earlier val prints ignored
    assert final_metrics(str(tmp_path / "seed1")) == {"accuracy": 60.0}
    assert len(parse_log(str(tmp_path / "seed1" / "log.txt"))) == 2
    summary = aggregate([str(tmp_path / s) for s in
                         ("seed1", "seed2", "seed3")])
    acc = summary["accuracy"]
    assert acc["mean"] == 62.0 and acc["n"] == 3
    assert abs(acc["std"] - 1.632993) < 1e-5


def test_grid_rows_shape_and_missing(tmp_path):
    """read_record.py:50-96 CSV shape: header [' '] + datasets, one row
    per seed, blank cell per missing run, misses reported."""
    setting = "vit_b16_5shots/nctx16_csc_ctp"
    datasets = ["cifar-10", "mnist", "gtsrb"]
    vals = {("cifar-10", "1"): 91.3, ("cifar-10", "2"): 90.7,
            ("mnist", "1"): 99.1, ("mnist", "2"): 99.2,
            ("gtsrb", "1"): 70.5}  # gtsrb seed2 missing
    for (ds, seed), v in vals.items():
        _write_log(tmp_path / ds / setting / f"seed{seed}", v)

    rows, missed = grid_rows(str(tmp_path), datasets, setting, ["1", "2"])
    assert rows[0] == [" ", "cifar-10", "mnist", "gtsrb"]
    assert rows[1] == ["seed 1", 91.3, 99.1, 70.5]
    assert rows[2] == ["seed 2", 90.7, 99.2, " "]
    assert missed == [("gtsrb", "2")]


def test_grid_cli_writes_csv(tmp_path, monkeypatch, capsys):
    from mvlpt_tpu.cli.parse_test_res import cli

    setting = "s"
    _write_log(tmp_path / "cifar-10" / setting / "seed1", 88.8)
    out = str(tmp_path / "grid.csv")
    monkeypatch.setattr(sys, "argv", [
        "parse_test_res", str(tmp_path), "--grid",
        "--datasets", "cifar-10,mnist", "--setting", setting,
        "--seeds", "1", "--out", out])
    cli()
    captured = capsys.readouterr()
    # diagnostics ride stderr so `--grid > grid.csv` stays a clean CSV
    assert "missed mnist seed 1" in captured.err
    assert "okay we missed 1 entries" in captured.err
    assert "missed" not in captured.out
    with open(out, newline="") as f:
        got = list(csv.reader(f))
    assert got == [[" ", "cifar-10", "mnist"], ["seed 1", "88.8", " "]]


def test_grid_rotated_logs_and_keyword(tmp_path):
    """log.txt* glob (rotated logs count, read_record.py:73) and
    keyword selection for multi-metric results dicts."""
    d = tmp_path / "ds" / "s" / "seed1"
    os.makedirs(d)
    with open(d / "log.txt-2026-01-01", "w") as f:
        f.write("results {'macro_f1': 55.5, 'accuracy': 77.7}\n")
    rows, missed = grid_rows(str(tmp_path), ["ds"], "s", ["1"],
                             keyword="macro_f1")
    assert rows[1] == ["seed 1", 55.5] and missed == []
    rows, _ = grid_rows(str(tmp_path), ["ds"], "s", ["1"])
    assert rows[1] == ["seed 1", 77.7]  # default: accuracy


def test_grid_unfinished_run_is_missed(tmp_path):
    """A crashed best_val run whose log ends in a per-epoch *val*
    results line must be a blank cell, not reported as final
    (read_record.py:78 requires "test" above the scraped line)."""
    d = tmp_path / "ds" / "s" / "seed1"
    os.makedirs(d)
    with open(d / "log.txt", "w") as f:
        f.write("Evaluate on the *val* set\n")
        f.write("results {'accuracy': 42.0}\n")
    rows, missed = grid_rows(str(tmp_path), ["ds"], "s", ["1"])
    assert rows[1] == ["seed 1", " "] and missed == [("ds", "1")]


def test_grid_explicit_keyword_never_falls_back(tmp_path):
    """--keyword names a metric some runs don't log: those cells blank
    out instead of silently mixing accuracy into the requested column."""
    _write_log(tmp_path / "ds" / "s" / "seed1", 77.7)  # accuracy only
    rows, missed = grid_rows(str(tmp_path), ["ds"], "s", ["1"],
                             keyword="11point_mAP")
    assert rows[1] == ["seed 1", " "] and missed == [("ds", "1")]


def test_grid_prefers_newest_log(tmp_path, capsys):
    """Newest-mtime log wins regardless of rotation naming convention
    (ours rotates the OLD file to log.txt-<ts>; Dassl timestamps the
    NEW one), and falling back to an older log prints a note."""
    d = tmp_path / "ds" / "s" / "seed1"
    os.makedirs(d)
    old, new = d / "log.txt-2026-01-01", d / "log.txt"
    for path, val in ((old, 11.1), (new, 99.9)):
        with open(path, "w") as f:
            f.write("Evaluate on the *test* set\n")
            f.write(f"results {{'accuracy': {val}}}\n")
    os.utime(old, (1, 1))  # old rotated file: ancient mtime
    rows, _ = grid_rows(str(tmp_path), ["ds"], "s", ["1"])
    assert rows[1] == ["seed 1", 99.9]

    # newest crashed before any test eval -> older log used, with a note
    with open(new, "w") as f:
        f.write("Evaluate on the *val* set\nresults {'accuracy': 5.0}\n")
    rows, _ = grid_rows(str(tmp_path), ["ds"], "s", ["1"])
    assert rows[1] == ["seed 1", 11.1]
    assert "using older" in capsys.readouterr().err


def test_grid_keyword_ignores_stale_log(tmp_path):
    """A stale rotated log that HAS the requested keyword must not fill
    a cell when the newest finished run lacks it — the newest test eval
    decides the cell alone (blank), never a superseded run's number."""
    d = tmp_path / "ds" / "s" / "seed1"
    os.makedirs(d)
    old, new = d / "log.txt-2026-01-01", d / "log.txt"
    with open(old, "w") as f:
        f.write("Evaluate on the *test* set\n"
                "results {'11point_mAP': 70.0}\n")
    with open(new, "w") as f:
        f.write("Evaluate on the *test* set\n"
                "results {'accuracy': 91.0}\n")
    os.utime(old, (1, 1))
    rows, missed = grid_rows(str(tmp_path), ["ds"], "s", ["1"],
                             keyword="11point_mAP")
    assert rows[1] == ["seed 1", " "] and missed == [("ds", "1")]


def test_grid_stdout_csv_is_clean(tmp_path, monkeypatch, capsys):
    """No --out: stdout carries ONLY CSV rows (parseable), notes on
    stderr."""
    from mvlpt_tpu.cli.parse_test_res import cli

    _write_log(tmp_path / "cifar-10" / "s" / "seed1", 88.8)
    monkeypatch.setattr(sys, "argv", [
        "parse_test_res", str(tmp_path), "--grid",
        "--datasets", "cifar-10,mnist", "--setting", "s", "--seeds", "1"])
    cli()
    out = capsys.readouterr().out
    got = list(csv.reader(out.splitlines()))
    assert got == [[" ", "cifar-10", "mnist"], ["seed 1", "88.8", " "]]
