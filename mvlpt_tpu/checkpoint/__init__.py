from mvlpt_tpu.checkpoint.convert import (
    load_clip,
    convert_openai_state_dict,
    convert_hf_clip,
    config_from_state_dict,
    OPENAI_MODELS,
)
from mvlpt_tpu.checkpoint.prompt_io import (
    save_prompt_checkpoint,
    load_prompt_checkpoint,
    apply_state_dict,
    average_checkpoints,
    checkpoint_path,
    flatten_params,
    unflatten_params,
)
