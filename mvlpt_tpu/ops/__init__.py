from mvlpt_tpu.ops.attention import pallas_attention, select_attn_fn
