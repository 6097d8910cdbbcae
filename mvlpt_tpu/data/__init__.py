from mvlpt_tpu.data.datum import Datum, DatasetBase
from mvlpt_tpu.data.transforms import EvalTransform, TrainTransform, build_transform
from mvlpt_tpu.data.loader import DataLoader, build_data_loader, prefetch_to_device
from mvlpt_tpu.data.managers import (
    CoopMultitaskDataManager,
    ElevaterDataManager,
    ElevaterMultitaskDataManager,
    build_data_manager,
)
