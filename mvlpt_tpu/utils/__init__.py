from mvlpt_tpu.utils.registry import Registry
from mvlpt_tpu.utils.logger import setup_logger, get_logger
from mvlpt_tpu.utils.seeding import set_random_seed
