from mvlpt_tpu.prompts.learner import (
    PromptSpec,
    PromptConsts,
    spec_from_cfg,
    init_prompt_params,
    build_prompt_consts,
    compute_cut_context_length,
    format_prompts,
)
from mvlpt_tpu.prompts.assembly import (
    upt_couple,
    vpt_prepare,
    coop_assemble,
    cocoop_condition,
)
