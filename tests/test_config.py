"""Config system: AttrDict semantics + immutability latch + validation
(/root/reference/AttrDict.py:34-76, config.py:53-94 capability)."""
import pytest

from saunet_tpu.utils.config import AttrDict, assert_and_infer_cfg, default_config


def test_attrdict_access_and_nesting():
    d = AttrDict({"a": 1, "nested": {"b": 2}})
    assert d.a == 1
    assert d.nested.b == 2  # dicts auto-wrap
    d.c = {"x": 9}
    assert d.c.x == 9
    with pytest.raises(AttributeError):
        _ = d.missing


def test_immutability_latch_recursive():
    d = AttrDict({"a": 1, "nested": {"b": 2}})
    d.immutable(True)
    assert d.is_immutable()
    with pytest.raises(AttributeError):
        d.a = 5
    with pytest.raises(AttributeError):
        d.nested.b = 5
    d.immutable(False)
    d.a = 5
    assert d.a == 5


def test_clone_is_deep():
    d = AttrDict({"nested": {"b": 2}})
    c = d.clone()
    c.nested.b = 7
    assert d.nested.b == 2


def test_assert_and_infer_cfg():
    cfg = default_config()
    out = assert_and_infer_cfg(cfg, make_immutable=True)
    assert out.is_immutable()
    cfg2 = default_config()
    cfg2.MODEL.NORM_FN = "bogus"
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(cfg2, make_immutable=False)


def test_default_config_surface():
    cfg = default_config()
    assert cfg.BATCH_WEIGHTING is False
    assert cfg.MODEL.BN_MOMENTUM == 0.9
    assert cfg.MODEL.BN_AXIS_NAME is None
    assert cfg.TRAIN.OPTIMIZER == "radam"
    assert cfg.DATASET.CROP_SIZE == 256
