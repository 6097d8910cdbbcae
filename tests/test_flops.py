"""FLOP accounting (utils/flops.py) vs hand-derived constants."""

from mvlpt_tpu.utils.flops import (
    flagship_step_flops, transformer_matmul_flops)


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


def test_flagship_magnitude():
    """The bench config lands in the hand-checked ballpark: image tower
    ~2.33 TFLOP (batch 32), total ~2.5 TFLOP/step."""
    f = flagship_step_flops()
    assert 2.3e12 < f < 2.8e12
    img = 32 * transformer_matmul_flops(201, 768, 12)
    assert abs(img - 2.328e12) / 2.328e12 < 0.01
    assert f > img  # text tower + stem + head on top
