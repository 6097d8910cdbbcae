from mvlpt_tpu.models.custom_clip import MVLPTModel, TaskClassRanges
from mvlpt_tpu.models import zsclip  # noqa: F401  (registers trainers)
