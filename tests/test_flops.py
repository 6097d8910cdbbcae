"""FLOP accounting (utils/flops.py) vs hand-derived constants."""

from mvlpt_tpu.utils.flops import (
    eval_step_flops, flagship_step_flops, transformer_matmul_flops)


def test_transformer_flops_hand_derived():
    """One layer, 10 tokens, width 8, fwd only:
    qkv 2*10*8*24=3840; out 2*10*8*8=1280; mlp 2*(2*10*8*32)=10240;
    attn 4*100*8=3200 -> 18560."""
    assert transformer_matmul_flops(10, 8, 1, bwd=False) == 18560
    # bwd adds proj again (15360) + 2x attn (6400)
    assert transformer_matmul_flops(10, 8, 1, bwd=True) == 18560 + 21760


def test_blocked_attention_counts_block_sizes():
    full = transformer_matmul_flops(20, 8, 1, bwd=False)
    blocked = transformer_matmul_flops(
        20, 8, 1, bwd=False, attn_token_blocks=[10, 10])
    # same projections, half the score/context work (2*10^2 vs 20^2)
    assert full - blocked == 4 * (20 * 20 - 2 * 10 * 10) * 8


def test_eval_flops_hand_derived():
    """Cached-text eval batch: image tower fwd only + stem + head.
    batch-100/100-cls B/16: 100*fwd(201 tok) ≈ 3.64 TFLOP dominates;
    stem 100*2*196*768*768 ≈ 23.1 GFLOP; logits/proj < 0.1 GFLOP."""
    f = eval_step_flops()
    img = 100 * transformer_matmul_flops(201, 768, 12, bwd=False)
    assert img < f < img * 1.01
    assert f - img == (100 * 2 * 196 * 768 * 768        # stem
                       + 2 * 100 * 512 * 100            # logits
                       + 100 * 2 * 768 * 512)           # image proj
    # sanity magnitude: ~3.66 TFLOP per batch-100
    assert 3.5e12 < f < 3.8e12


def test_flagship_magnitude():
    """The bench config lands in the hand-checked ballpark: image tower
    ~2.33 TFLOP (batch 32), total ~2.5 TFLOP/step."""
    f = flagship_step_flops()
    assert 2.3e12 < f < 2.8e12
    img = 32 * transformer_matmul_flops(201, 768, 12)
    assert abs(img - 2.328e12) / 2.328e12 < 0.01
    assert f > img  # text tower + stem + head on top
