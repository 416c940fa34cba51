from .config import AttrDict, cfg, default_config, assert_and_infer_cfg
from .meters import AverageMeter
from .misc import as_numpy, color_encode
