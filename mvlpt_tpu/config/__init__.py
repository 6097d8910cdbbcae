from mvlpt_tpu.config.config import CfgNode
from mvlpt_tpu.config.defaults import get_cfg_default, extend_cfg, validate_support
