"""Building-block modules for SAUNet, NHWC / flax.

Capability map to the reference (cited per class):
  SEModule             <- /root/reference/models/attention_blocks.py:28-57
  SpatialAttentionBlock<- /root/reference/models/attention_blocks.py:145-173
  MRFUp + DualAttBlock <- /root/reference/models/attention_blocks.py:175-238
  ResBasicBlock        <- /root/reference/models/resnet.py:30-59
  GatedSpatialConv     <- /root/reference/models/GSConv.py:16-62
  DecoderBlock         <- /root/reference/models/models.py:203-237
  conv3x3_bn_relu      <- /root/reference/models/models.py:118-123

TPU-first notes: everything is NHWC so channels ride the 128-lane dimension;
convs hit the MXU; BatchNorm under SPMD jit computes *global*-batch statistics
(the whole SynchronizedBatchNorm machinery of
/root/reference/lib/nn/modules/{batchnorm,comm,replicate}.py collapses to
nothing — the compiler inserts the cross-device reductions).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm

# Kaiming-normal fan-out: normal(0, sqrt(2 / (k*k*out))) — the init the
# reference applies to every conv in its blocks.
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_normal = nn.initializers.glorot_normal()

Dtype = Any


class ConvBNRelu(nn.Module):
    """Conv -> BatchNorm -> ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            kernel_init=kaiming_normal_out, dtype=self.dtype,
        )(x)
        x = batch_norm(train, self.dtype)(x)
        return self.act(x)


class SEModule(nn.Module):
    """Squeeze-and-excite channel attention: global avgpool -> 1x1 reduce ->
    ReLU -> 1x1 expand -> sigmoid -> scale."""
    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1),
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="fc1")(s)
        s = self.act(s)
        s = nn.Conv(self.channels, (1, 1), kernel_init=kaiming_normal_out,
                    dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class SpatialAttentionBlock(nn.Module):
    """1x1 down-proj -> BN -> ReLU -> 1x1 to one channel -> sigmoid gate.

    Returns the (N, H, W, 1) attention map. The reference's softmax path is
    dead code (normalize_attn=False default; see SURVEY.md §2.7) and is not
    reproduced.
    """
    attn_features: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = nn.Conv(self.attn_features, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="down")(x)
        c = batch_norm(train, self.dtype)(c)
        c = self.act(c)
        c = nn.Conv(1, (1, 1), use_bias=True,
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="phi")(c)
        return nn.sigmoid(c)


class ConvTransposeBNRelu(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) exact 2x upsampler -> BN -> ReLU."""
    features: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        # 'SAME' with k=4/s=2 gives the exact 2x output size of torch's
        # ConvTranspose2d(kernel=4, stride=2, padding=1).
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=kaiming_normal_out, dtype=self.dtype,
        )(x)
        x = batch_norm(train, self.dtype)(x)
        return self.act(x)


class DualAttBlock(nn.Module):
    """Decoder fusion block: upsample coarse, concat skip, 3x3 conv-BN-ReLU,
    then out = SE(x) * (1 + spatial(x)). Returns (out, spatial_map)."""
    outchannels: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True):
        if len(inputs) == 2:
            coarse, skip = inputs
            up = ConvTransposeBNRelu(coarse.shape[-1], dtype=self.dtype,
                                     act=self.act, name="mrf_up")(coarse, train)
            fused = jnp.concatenate([skip, up], axis=-1)
        else:
            fused = inputs[0]
        fused = nn.Conv(self.outchannels, (3, 3), padding="SAME",
                        kernel_init=kaiming_normal_out, dtype=self.dtype,
                        name="c3x3")(fused)
        fused = batch_norm(train, self.dtype)(fused)
        fused = self.act(fused)
        spatial = SpatialAttentionBlock(self.outchannels // 4,
                                        dtype=self.dtype, act=self.act,
                                        name="spatialAttn")(fused, train)
        channel = SEModule(self.outchannels, 16, dtype=self.dtype,
                           act=self.act, name="channelAttn")(fused)
        out = channel * (spatial + 1.0)
        return out, spatial


class ResBasicBlock(nn.Module):
    """ResNet BasicBlock (stride 1, no downsample) — the shape-stream
    residual unit."""
    planes: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = self.act(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        return self.act(out + residual)


class GatedSpatialConv(nn.Module):
    """Shape-stream gate: alpha = gate_net(cat(shape_feat, texture_cue));
    out = conv1x1(shape_feat * (1 + alpha)). Returns (out, alpha)."""
    features: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, input_features, gating_features, train: bool = True):
        cat = jnp.concatenate([input_features, gating_features], axis=-1)
        g = batch_norm(train, self.dtype, name="gate_bn1")(cat)
        g = nn.Conv(cat.shape[-1], (1, 1), kernel_init=kaiming_normal_out,
                    dtype=self.dtype, name="gate_conv1")(g)
        g = self.act(g)
        g = nn.Conv(1, (1, 1), kernel_init=kaiming_normal_out,
                    dtype=self.dtype, name="gate_conv2")(g)
        g = batch_norm(train, self.dtype, name="gate_bn2")(g)
        alpha = nn.sigmoid(g)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=xavier_normal, dtype=self.dtype,
                      name="conv")(input_features * (alpha + 1.0))
        return out, alpha


class SEBottleneck(nn.Module):
    """SENet-154-style bottleneck with squeeze-excite before the residual
    add (inventory parity: attention_blocks.py:85-107; unused by SAUNet)."""
    planes: int
    groups: int = 1
    reduction: int = 16
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes * 2, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_out, dtype=self.dtype,
                      name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = self.act(out)
        out = nn.Conv(self.planes * 4, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", feature_group_count=self.groups,
                      use_bias=False, kernel_init=kaiming_normal_out,
                      dtype=self.dtype, name="conv2")(out)
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
        out = SEModule(self.planes * 4, self.reduction, dtype=self.dtype,
                       act=self.act, name="se_module")(out)
        return self.act(out + residual)


class SEResNetBottleneck(nn.Module):
    """Caffe-style SE-ResNet bottleneck (stride in conv1; inventory parity:
    attention_blocks.py:110-142; unused by SAUNet)."""
    planes: int
    groups: int = 1
    reduction: int = 16
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                      use_bias=False, kernel_init=kaiming_normal_out,
                      dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = self.act(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME",
                      feature_group_count=self.groups, use_bias=False,
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
        out = SEModule(self.planes * 4, self.reduction, dtype=self.dtype,
                       act=self.act, name="se_module")(out)
        return self.act(out + residual)


def _gaussian_kernel7(sigma: float = 3.0):
    import numpy as np
    k = 7
    ax = np.arange(k, dtype=np.float64)
    gx = np.exp(-((ax - (k - 1) / 2.0) ** 2) / (2 * sigma ** 2))
    kern = np.outer(gx, gx)
    return (kern / kern.sum()).astype("float32")


class HighFrequencyGatedSpatialConv(nn.Module):
    """Difference-of-Gaussian variant of the shape-stream gate (inventory
    parity: GSConv.py:69-158; unused by SAUNet): a frozen 7x7 Gaussian
    (sigma=3) depthwise blur extracts high-frequency detail which is gated
    like GatedSpatialConv."""
    features: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, input_features, gating_features, train: bool = True):
        c = input_features.shape[-1]
        g7 = jnp.asarray(_gaussian_kernel7())
        kern = jnp.tile(g7[:, :, None, None], (1, 1, 1, c)).astype(self.dtype)
        smooth = jax.lax.conv_general_dilated(
            input_features.astype(self.dtype), kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        dog = input_features - smooth
        dog = nn.Conv(c, (1, 1), kernel_init=kaiming_normal_out,
                      dtype=self.dtype, name="cw")(
                          jnp.concatenate([dog, input_features], axis=-1))

        cat = jnp.concatenate([input_features, gating_features], axis=-1)
        gte = batch_norm(train, self.dtype, name="gate_bn1")(cat)
        gte = nn.Conv(cat.shape[-1], (1, 1), kernel_init=kaiming_normal_out,
                      dtype=self.dtype, name="gate_conv1")(gte)
        gte = self.act(gte)
        gte = nn.Conv(1, (1, 1), kernel_init=kaiming_normal_out,
                      dtype=self.dtype, name="gate_conv2")(gte)
        gte = batch_norm(train, self.dtype, name="gate_bn2")(gte)
        alpha = nn.sigmoid(gte)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       kernel_init=xavier_normal, dtype=self.dtype,
                       name="conv")(dog * (alpha + 1.0))


class DecoderBlock(nn.Module):
    """conv3x3-BN-ReLU -> ConvTranspose 2x -> BN -> ReLU."""
    middle_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBNRelu(self.middle_channels, 3, dtype=self.dtype,
                       act=self.act, name="conv")(x, train)
        x = ConvTransposeBNRelu(self.out_channels, dtype=self.dtype,
                                act=self.act, name="up")(x, train)
        return x


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
