"""Immutable attribute-dict config system.

Capability parity with the reference's Detectron-style global config
(/root/reference/AttrDict.py:34-76, /root/reference/config.py:53-94): nested
attribute access, recursive immutability latch, and a small global `cfg` with
the knobs the reference consumes (BATCH_WEIGHTING at loss.py:16, MODEL.NORM_FN
standing in for MODEL.BNFUNC at models/norm.py:20).

Redesigned for JAX: the config holds only hashable/static values so it can be
closed over by jitted functions without retracing hazards.
"""
from __future__ import annotations

IMMUTABLE = "__immutable__"


class AttrDict(dict):
    """dict with attribute access and a recursive immutability latch."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__[IMMUTABLE] = False
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, AttrDict):
                self[k] = AttrDict(v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if self.__dict__[IMMUTABLE]:
            raise AttributeError(
                f"AttrDict is immutable; cannot set {name!r}"
            )
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        self[name] = value

    def __setitem__(self, name, value):
        if self.__dict__.get(IMMUTABLE, False):
            raise AttributeError(
                f"AttrDict is immutable; cannot set {name!r}"
            )
        super().__setitem__(name, value)

    def immutable(self, is_immutable: bool = True):
        """Recursively (un)freeze the config."""
        self.__dict__[IMMUTABLE] = is_immutable
        for v in self.values():
            if isinstance(v, AttrDict):
                v.immutable(is_immutable)

    def is_immutable(self) -> bool:
        return self.__dict__[IMMUTABLE]

    def clone(self) -> "AttrDict":
        out = AttrDict()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, AttrDict) else v
        return out


def default_config() -> AttrDict:
    """Global defaults mirroring the reference's `config.py` surface."""
    cfg = AttrDict()
    cfg.BATCH_WEIGHTING = False
    cfg.EPOCH = 0

    cfg.MODEL = AttrDict()
    # 'batchnorm' | 'syncbn' — under SPMD jit both compute global-batch
    # statistics, so they are the same program; the knob is kept for API parity.
    cfg.MODEL.NORM_FN = "batchnorm"
    cfg.MODEL.BN_MOMENTUM = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    cfg.MODEL.BN_EPS = 1e-5
    # mesh axis for explicit cross-shard BN sync under shard_map
    # (None under jit auto-sharding, where global-batch stats are automatic)
    cfg.MODEL.BN_AXIS_NAME = None

    cfg.DATASET = AttrDict()
    cfg.DATASET.ACDC_DIR = ""
    cfg.DATASET.CROP_SIZE = 256
    cfg.DATASET.TRAIN_SPACING_MM = 1.25
    cfg.DATASET.TEST_SPACING_MM = 1.5
    cfg.DATASET.NUM_CLASSES = 4

    cfg.TRAIN = AttrDict()
    cfg.TRAIN.LR = 1e-4
    cfg.TRAIN.BATCH_SIZE = 10
    cfg.TRAIN.NUM_EPOCH = 180
    cfg.TRAIN.OPTIMIZER = "radam"
    cfg.TRAIN.SEED = 304
    cfg.TRAIN.DTYPE = "bfloat16"  # compute dtype; params/stats stay float32

    return cfg


# Global config instance (mutable until a driver freezes it).
cfg = default_config()


def assert_and_infer_cfg(config: AttrDict = cfg, make_immutable: bool = True):
    """Validate derived settings and optionally freeze, mirroring
    /root/reference/config.py:73-94."""
    assert config.MODEL.NORM_FN in ("batchnorm", "syncbn")
    assert config.TRAIN.DTYPE in ("float32", "bfloat16")
    if make_immutable:
        config.immutable(True)
    return config
