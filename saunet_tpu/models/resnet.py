"""ResNet backbone family (flax, NHWC).

Capability parity with /root/reference/models/resnet.py: BasicBlock (used by
the SAUNet shape stream — re-exported from blocks.py), Bottleneck, the full
ResNet trunk with stage taps, and resnet18/34/50/101 constructors. The
reference downloads MIT-CSAIL pretrained weights (resnet.py:17-21);
zero-egress here, so construction is always fresh-init with a state-dict
porting hook mirroring the densenet one.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResBasicBlock, kaiming_normal_out  # noqa: F401  (BasicBlock parity)
from .norm import batch_norm

Dtype = Any


class BasicBlockStride(nn.Module):
    """BasicBlock with optional stride/downsample (full backbone variant;
    the stride-1 shape-stream unit lives in blocks.ResBasicBlock)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = self.act(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_out,
                               dtype=self.dtype, name="down_conv")(x)
            residual = batch_norm(train, self.dtype, name="down_bn")(residual)
        return self.act(out + residual)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = self.act(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        out = self.act(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv3")(out)
        out = batch_norm(train, self.dtype, name="bn3")(out)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_out,
                               dtype=self.dtype, name="down_conv")(x)
            residual = batch_norm(train, self.dtype, name="down_bn")(residual)
        return self.act(out + residual)


class ResNet(nn.Module):
    """Deep-stem ResNet trunk (3x 3x3 stem convs like the reference's
    resnet.py:103-112) returning stage taps (c1..c5)."""
    block: type = BasicBlockStride
    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        for i, (f, s) in enumerate([(64, 2), (64, 1), (128, 1)]):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                        use_bias=False, kernel_init=kaiming_normal_out,
                        dtype=self.dtype, name=f"stem_conv{i + 1}")(x)
            x = batch_norm(train, self.dtype, name=f"stem_bn{i + 1}")(x)
            x = self.act(x)
        c1 = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps = []
        planes = 64
        in_ch = 128
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            exp = self.block.expansion
            for b in range(n_blocks):
                need_down = (b == 0 and
                             (stride != 1 or in_ch != planes * exp))
                x = self.block(planes=planes,
                               stride=stride if b == 0 else 1,
                               downsample=need_down, dtype=self.dtype,
                               act=self.act,
                               name=f"layer{stage + 1}_block{b + 1}")(
                                   x, train)
            in_ch = planes * exp
            planes *= 2
            taps.append(x)
        c2, c3, c4, c5 = taps
        return c1, c2, c3, c4, c5


def port_resnet_state_dict(state_dict) -> dict:
    """Map an MIT-CSAIL/torchvision deep-stem ResNet `state_dict`
    (name -> numpy array, OIHW conv kernels) onto this trunk's
    {'params', 'batch_stats'} pytrees — the porting hook mirroring
    `densenet.port_torchvision_state_dict` for the reference's `load_url`
    pretrained path (/root/reference/models/resnet.py:220-228).

    Naming handled (the reference's 3-conv stem variant, resnet.py:103-112):
      conv1/bn1..conv3/bn3            -> stem_conv1/stem_bn1..3
      layerS.B.convK / .bnK           -> layerS_block{B+1}.convK/.bnK
      layerS.B.downsample.0 / .1      -> layerS_block{B+1}.down_conv/_bn
    The classifier head (fc.*) is ignored.
    """
    import re

    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_w(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW -> HWIO

    def put_bn(mod_path, field, v):
        if field == "weight":
            put(params, mod_path + ("scale",), v)
        elif field == "bias":
            put(params, mod_path + ("bias",), v)
        elif field == "running_mean":
            put(stats, mod_path + ("mean",), v)
        elif field == "running_var":
            put(stats, mod_path + ("var",), v)

    for name, v in state_dict.items():
        v = np.asarray(v)
        m = re.match(r"^conv([123])\.weight$", name)
        if m:
            put(params, (f"stem_conv{m.group(1)}", "kernel"), conv_w(v))
            continue
        m = re.match(r"^bn([123])\.(\w+)$", name)
        if m:
            put_bn((f"stem_bn{m.group(1)}",), m.group(2), v)
            continue
        m = re.match(r"^layer(\d+)\.(\d+)\.(.+)$", name)
        if not m:
            continue  # fc head, num_batches_tracked at top level
        block = f"layer{m.group(1)}_block{int(m.group(2)) + 1}"
        rest = m.group(3)
        mm = re.match(r"^conv(\d)\.weight$", rest)
        if mm:
            put(params, (block, f"conv{mm.group(1)}", "kernel"), conv_w(v))
            continue
        mm = re.match(r"^bn(\d)\.(\w+)$", rest)
        if mm:
            put_bn((block, f"bn{mm.group(1)}"), mm.group(2), v)
            continue
        mm = re.match(r"^downsample\.0\.weight$", rest)
        if mm:
            put(params, (block, "down_conv", "kernel"), conv_w(v))
            continue
        mm = re.match(r"^downsample\.1\.(\w+)$", rest)
        if mm:
            put_bn((block, "down_bn"), mm.group(1), v)
    return {"params": params, "batch_stats": stats}


def resnet18(**kw) -> ResNet:
    return ResNet(block=BasicBlockStride, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block=BasicBlockStride, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block=BottleneckBlock, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block=BottleneckBlock, layers=(3, 4, 23, 3), **kw)
