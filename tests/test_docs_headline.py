"""Headline-provenance guard (round-4 verdict item 3).

README.md and BASELINE.md each carry a machine-readable
``<!-- bench-headline: key=value ... -->`` comment next to their
benchmark prose. This test asserts, mechanically, that

  1. both comments quote the same capture,
  2. the quoted figures match the NEWEST ``BENCH_r*.json`` parsed
     values within the stated run-to-run tunnel noise (~1%; we allow
     2% so a fresh driver capture inside the noise band does not fail
     the next round's suite at start), and
  3. the human-readable prose actually contains the quoted numbers
     (so the comment cannot be updated while the text drifts).

If this fails after a new driver capture, re-sync the two docs to the
new ``BENCH_r*.json`` parsed values and update the comments.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# keys guarded, with the relative tolerance vs the newest driver capture
GUARDED = {
    "value": 0.02,
    "vs_baseline": 0.02,
    "eval_img_s": 0.02,
    "zs_eval_img_s": 0.02,
    "mfu": 0.02,
    "device_ms": 0.02,
}

_COMMENT = re.compile(r"<!--\s*bench-headline:\s*([^>]*?)-->")


def _newest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no BENCH_r*.json records found"
    path = paths[-1]
    with open(path) as f:
        rec = json.load(f)
    return os.path.basename(path), rec["parsed"]


def _headline_comment(doc: str) -> dict:
    with open(os.path.join(REPO, doc)) as f:
        text = f.read()
    m = _COMMENT.search(text)
    assert m, f"{doc} is missing its <!-- bench-headline: ... --> comment"
    fields = dict(kv.split("=", 1) for kv in m.group(1).split())
    return text, fields


def test_headline_comments_agree_and_match_newest_bench():
    bench_name, parsed = _newest_bench()
    readme_text, readme = _headline_comment("README.md")
    baseline_text, baseline = _headline_comment("BASELINE.md")

    assert readme == baseline, (
        "README.md and BASELINE.md bench-headline comments disagree — "
        f"README={readme} BASELINE={baseline}")

    for key, tol in GUARDED.items():
        quoted = float(readme[key])
        actual = float(parsed[key])
        assert abs(quoted - actual) <= tol * abs(actual), (
            f"doc headline {key}={quoted} drifted from the newest driver "
            f"capture {bench_name} ({key}={actual}, tol {tol:.0%}) — "
            f"re-sync README.md/BASELINE.md and their bench-headline "
            f"comments")


def test_prose_contains_quoted_figures():
    """The visible text must quote the same numbers as the comment:
    throughput to 0.1 img/s, eval/zs as integers, vs_baseline to two
    decimals, MFU to two decimals."""
    for doc in ("README.md", "BASELINE.md"):
        text, fields = _headline_comment(doc)
        v = float(fields["value"])
        assert f"{v:.1f}" in text, f"{doc} prose lacks {v:.1f} img/s"
        vs = float(fields["vs_baseline"])
        assert f"{vs:.2f}" in text or f"{vs:.3f}" in text, (
            f"{doc} prose lacks vs_baseline {vs:.2f}x")
        mfu = float(fields["mfu"])
        assert f"{mfu:.2f}" in text, f"{doc} prose lacks MFU {mfu:.2f}"
    # eval figures are quoted in README only (BASELINE's eval story
    # lives in its own section with more context)
    text, fields = _headline_comment("README.md")
    for key in ("eval_img_s", "zs_eval_img_s"):
        n = int(round(float(fields[key])))
        assert str(n) in text, f"README.md prose lacks {key} {n}"
