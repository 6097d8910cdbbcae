from mvlpt_tpu.data.elevater.manifest import (
    ELEVATER_20_TASKS,
    load_metadata,
    class_map,
    class_map_metric,
    template_map,
    load_task_manifest,
    load_multitask_manifest,
    sample_few_shot_subset,
    train_val_split,
)
