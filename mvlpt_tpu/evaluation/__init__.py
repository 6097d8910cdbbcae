from mvlpt_tpu.evaluation.metrics import get_metric, group_wise, mean_lp_error
from mvlpt_tpu.evaluation.evaluator import ClassificationEvaluator
from mvlpt_tpu.evaluation.detection import (
    detection_map_single_iou, detection_map_multi_iou, detection_map_coco)
from mvlpt_tpu.evaluation.matting import (
    matting_mean_iou, matting_foreground_iou, matting_boundary_mean_iou,
    matting_boundary_foreground_iou, matting_l1_error)
from mvlpt_tpu.evaluation.caption import caption_report
