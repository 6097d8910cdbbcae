"""Analytic matmul-FLOP accounting for MFU reporting.

XLA's ``compiled.cost_analysis()`` is not populated usefully by the
axon (tunneled TPU) backend in this environment, so MFU in bench.py is
anchored to an analytic count instead: matmul FLOPs only (the standard
MFU convention — elementwise/LN/softmax excluded), forward plus
dx-only backward. The backbone is frozen, so NO weight-gradient
matmuls exist anywhere:

* projection ``y = x W``: fwd ``2·T·in·out``; backward is the single
  ``dx = dy Wᵀ`` matmul — same count again.
* attention pair ``S = q kᵀ`` / ``o = P v``: fwd ``2·T²·W`` each;
  backward needs two matmuls per pair (dq,dk / dP,dv) — 2x fwd.

The per-step total for the flagship UPT config is validated by a
hand-derived constant in tests/test_flops.py.
"""

from __future__ import annotations


def transformer_matmul_flops(
    n_tokens: int,
    width: int,
    n_layers: int,
    mlp_ratio: int = 4,
    attn_token_blocks: list[int] | None = None,
    bwd: bool = True,
) -> int:
    """Matmul FLOPs for a pre-LN transformer stack over ``n_tokens``
    total tokens (fwd + dx-only bwd).

    ``attn_token_blocks``: attention block sizes (block-diagonal
    attention, e.g. the packed text tower attends within per-class
    blocks). Default: one full block of ``n_tokens``."""
    blocks = attn_token_blocks or [n_tokens]
    proj = (
        2 * n_tokens * width * (3 * width)          # qkv
        + 2 * n_tokens * width * width              # out
        + 2 * 2 * n_tokens * width * (mlp_ratio * width)  # fc + proj
    )
    attn = sum(4 * t * t * width for t in blocks)   # scores + context
    per_layer = proj + attn
    if bwd:
        per_layer += proj + 2 * attn
    return n_layers * per_layer


def flagship_step_flops(
    batch: int = 32,
    n_cls: int = 100,
    image_tokens: int = 201,     # 1 CLS + 196 patches + 4 VPT
    vision_width: int = 768,
    vision_layers: int = 12,
    text_tokens_per_cls: int = 11,  # CUT_CONTEXTLEN for the bench labels
    text_width: int = 512,
    text_layers: int = 12,
    text_pack_classes: int = 10,   # classes packed per text row (g)
    patch_tokens: int = 196,
    patch_dim: int = 768,          # 16*16*3
) -> int:
    """Per-train-step matmul FLOPs for the ViT-B/16 UPT bench config.

    Counted: image tower fwd+bwd (per image), frozen stem fwd only
    (pre-embedded; its input is not differentiated), packed text tower
    fwd+bwd (once per step — prompts are shared across the batch), and
    the final logit head. Excluded (<1% combined): the UPT coupler
    (1-layer transformer over ~52 tokens of width 128), prompt
    projections, LN/softmax/elementwise."""
    image = batch * transformer_matmul_flops(
        image_tokens, vision_width, vision_layers)
    stem = batch * 2 * patch_tokens * patch_dim * vision_width
    packed = text_pack_classes * text_tokens_per_cls
    text = transformer_matmul_flops(
        n_cls * text_tokens_per_cls, text_width, text_layers,
        attn_token_blocks=[packed] * -(-n_cls // text_pack_classes))
    # logit head: (B, E) @ (E, C) fwd + dx bwd on the text side only
    embed = text_width  # CLIP ViT-B/16 embed dim = 512
    logits = 2 * 2 * batch * embed * n_cls
    # image/text projections to the shared space
    proj = (batch * 2 * vision_width * embed * 2
            + n_cls * 2 * text_width * embed * 2)
    return image + stem + text + logits + proj


def eval_step_flops(
    batch: int = 100,
    n_cls: int = 100,
    image_tokens: int = 201,
    vision_width: int = 768,
    vision_layers: int = 12,
    patch_tokens: int = 196,
    patch_dim: int = 768,
    embed: int = 512,
) -> int:
    """Per-eval-batch matmul FLOPs for the cached-text eval fast path
    (make_cached_text_eval): image tower forward only — the text tower
    is computed ONCE per split and cached, so it amortizes to ~zero per
    batch — plus the stem, the image projection, and the logit matmul.
    No backward anywhere (eval never differentiates)."""
    image = batch * transformer_matmul_flops(
        image_tokens, vision_width, vision_layers, bwd=False)
    stem = batch * 2 * patch_tokens * patch_dim * vision_width
    logits = 2 * batch * embed * n_cls
    proj = batch * 2 * vision_width * embed
    return image + stem + logits + proj
