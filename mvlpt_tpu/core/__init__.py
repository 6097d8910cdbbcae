from mvlpt_tpu.core.clip import (
    CLIPConfig,
    init_clip_params,
    cast_backbone,
    encode_image,
    encode_text,
    clip_logits,
    count_params,
)
