"""bf16-drift insurance: quantified fp32-vs-bf16 tower agreement.

The dtype policy (core/layers.py) runs bf16 matmuls with fp32 islands
(LN stats, softmax, logit head). Before real CLIP weights ever arrive,
pin down a measured tolerance on random weights so a future regression
in the dtype policy (or in the fused kernels' numerics contract) fails
a test instead of silently degrading zero-shot accuracy:

* zero-shot logits: bf16 towers vs fp32 towers — bounded relative
  drift against the logit spread, and EXACT top-1 agreement on every
  sample whose fp32 decision margin exceeds the measured drift bound
  (samples inside the margin are genuinely ambiguous under any finite
  precision).
* fused-block kernels vs the XLA path, both bf16 — same contract,
  tighter bound (same math, different fusion boundaries).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlpt_tpu.core import clip as clip_core
from mvlpt_tpu.core.clip import CLIPConfig, cast_backbone, init_clip_params
from mvlpt_tpu.ops import block as bops

# Measured on random-init towers (this file, seeds below): bf16-vs-fp32
# logit drift measures ~5-6% of the logit standard deviation; the
# fused-vs-XLA bf16 delta ~7% (different fusion boundaries reassociate
# different partial sums — both deltas are bf16 rounding noise of the
# same magnitude, neither path is "more correct"). Asserts use ~2x
# headroom over the measured values.
BF16_REL_TOL = 0.12
FUSED_REL_TOL = 0.14


def _mid_clip():
    # deep enough for drift to accumulate, small enough for CPU
    return CLIPConfig(
        embed_dim=64, image_resolution=64, vision_layers=4, vision_width=128,
        vision_patch_size=16, transformer_width=128, transformer_heads=4,
        transformer_layers=4, vision_heads_override=4)


def _zeroshot_logits(backbone, cfg, images, token_ids, attn_fn=None):
    img = clip_core.encode_image(backbone, images, cfg, attn_fn=attn_fn)
    txt = clip_core.encode_text(backbone, token_ids, cfg, attn_fn=attn_fn)
    return np.asarray(
        clip_core.clip_logits(img, txt, backbone["logit_scale"]))


def _check_drift(ref, got, rel_tol):
    """(max |Δ| / std(ref) bound, exact top-1 match outside the margin)."""
    spread = float(np.std(ref))
    drift = float(np.abs(got - ref).max())
    assert drift <= rel_tol * spread, (
        f"logit drift {drift:.4f} exceeds {rel_tol} * spread {spread:.4f}")
    top = np.sort(ref, axis=-1)
    margin = top[:, -1] - top[:, -2]
    confident = margin > 2 * drift
    assert confident.sum() > 0, "degenerate fixture: no confident samples"
    agree = (np.argmax(ref[confident], -1) == np.argmax(got[confident], -1))
    assert agree.all(), (
        f"top-1 flipped on {(~agree).sum()} confident samples "
        f"(margin > {2 * drift:.4f})")
    return drift / spread


@pytest.fixture(scope="module")
def fixture():
    cfg = _mid_clip()
    backbone32 = init_clip_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(48, 64, 64, 3), jnp.float32)
    # random short token rows with EOT = max id position (argmax rule)
    ids = rng.randint(1, 1000, (16, 13)).astype(np.int32)
    ids[:, 0] = 40000
    ids[:, -1] = 49407  # large id -> argmax -> EOT at the end
    return cfg, backbone32, images, jnp.asarray(ids)


def test_bf16_vs_fp32_zeroshot(fixture):
    cfg, backbone32, images, ids = fixture
    ref = _zeroshot_logits(backbone32, cfg, images, ids)
    bf16 = cast_backbone(backbone32, jnp.bfloat16)
    got = _zeroshot_logits(
        bf16, cfg, images.astype(jnp.bfloat16), ids)
    rel = _check_drift(ref, got, BF16_REL_TOL)
    print(f"bf16-vs-fp32 drift: {rel:.4f} of logit spread")


def test_fused_vs_xla_bf16(fixture):
    cfg, backbone32, images, ids = fixture
    bf16 = cast_backbone(backbone32, jnp.bfloat16)
    imgs_bf = images.astype(jnp.bfloat16)
    ref = _zeroshot_logits(bf16, cfg, imgs_bf, ids, attn_fn=None)
    got = _zeroshot_logits(bf16, cfg, imgs_bf, ids, attn_fn=bops.FUSED)
    rel = _check_drift(ref, got, FUSED_REL_TOL)
    print(f"fused-vs-xla bf16 drift: {rel:.4f} of logit spread")


@pytest.mark.slow  # 3 full tiny-tower trajectories + interpret kernels
def test_training_trajectory_drift_inside_seed_spread():
    """Small-N CPU analogue of scripts/bf16_drift_train.py (round-4
    verdict item 2): N SGD steps of the production path (bf16 compute +
    fused kernels in interpret mode + windowed dispatch) must land
    INSIDE the fp32 path's own spread under a benign perturbation (a
    fresh same-distribution data stream). The real-chip measurement
    (--backbone b16) is recorded in BASELINE.md."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "bf16_drift_train.py")
    spec = importlib.util.spec_from_file_location("bf16_drift_train", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.measure(backbone="tiny", steps=12, window=4, batch=8, n_cls=8)
    # dtype+kernels+windowing drift stays well inside the data-stream
    # yardstick; exact margins are environment noise, the CONTRACT is
    # ratio < 1 with headroom
    assert out["param_ratio"] < 0.5, out
    assert out["loss_ratio"] < 0.5, out
    # the kernel-only component is bf16-rounding-noise-sized too: the
    # same order as the full production drift, nowhere near the
    # data-stream spread (measured 0.0017 vs spread 0.030)
    assert out["param_dist_kernels_only"] < 0.5 * out["param_dist_seed"], out
