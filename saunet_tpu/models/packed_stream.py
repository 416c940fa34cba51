"""Lane-packed shape-stream modules (param-compatible with the XLA path).

The SAUNet shape stream (/root/reference/models/models.py:337-356) runs
64/32/16/8/1-channel maps at full input resolution. In NHWC those lane
counts store padded to 128 in HBM, so the measured train cost of the
stream is ~133 ms / 86 GB per step at 224² b64 (tools/profile_train.py)
— almost all of it padding traffic. These modules compute the *same
math* in the packed (B, H, W/P, P*C) layout of ops/packed.py.

Param-tree compatibility is the design contract: every module here
declares parameters with the exact names, shapes, dtypes, and
initializers of the dense module it replaces (nn.Conv / nn.BatchNorm /
ResBasicBlock / GatedSpatialConv), so checkpoints are interchangeable
between `stream_impl='xla'` and `'packed'`, and oracle tests can assert
numerical equivalence under identical parameters.

The (C+1)-channel gate intermediates of GatedSpatialConv never exist as
tensors: the gate is algebraically split into a C-channel packed part
and a 1-channel cue part (BatchNorm is per-channel and 1x1 convs are
linear, so the split is exact), each lane-full.
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.packed import (
    broadcast_1ch,
    conv3x3_dense_to_packed,
    packed_bn_stats,
    packed_channel_mean,
    packed_conv1x1,
    packed_conv3x3,
    packed_scale_bias,
)
from ..utils.config import cfg
from .blocks import kaiming_normal_out, xavier_normal

Dtype = Any
# a packed channel-split tensor part: (array, true_channels, pack)
Part = Tuple[jnp.ndarray, int, int]


def stream_packs(w: int) -> dict:
    """Consistent pack factors for the stream's channel widths at image
    width `w`: each pack divides the next ({64: p, 32: ., 16: ., 8: .,
    1: .}), so every channel-narrowing conv is an integer pack increase
    and every cue broadcast an integer pack decrease. All packs are 1
    when `w` is odd (packed layout degenerates to dense math)."""
    packs = {}
    prev = 1
    for c in (64, 32, 16, 8, 1):
        best = prev
        p = prev
        while True:
            p += prev
            if p * c > 128:
                break
            if w % p == 0:
                best = p
        packs[c] = best
        prev = best
    return packs


def packed_stream_worthwhile(w: int) -> bool:
    """Packed beats XLA only when real packing happens across the stream
    widths (even width with a deep divisor chain)."""
    pk = stream_packs(w)
    return pk[64] >= 2 and pk[8] >= 8


class PConv1x1(nn.Module):
    """Packed 1x1 conv; param-compatible with nn.Conv(features, (1, 1))."""
    features: int
    c_in: int
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_out

    @nn.compact
    def __call__(self, xp, p_in: int, p_out: int):
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, self.c_in, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return packed_conv1x1(xp, kernel, self.c_in, p_in, self.features,
                              p_out, bias=bias)


class PConv3x3(nn.Module):
    """Packed 3x3 SAME conv; param-compatible with nn.Conv(features, (3, 3)).

    Input may be a channel-split part list [(xp, c), ...] (all at pack
    `p`, channels in order summing to c_in): conv(concat(parts)) is
    computed as the sum of per-part convs with the kernel sliced along
    its input-channel axis, so the lane-interleaving concat never
    happens.

    impl: 'block' = the (3, 3) block-placed kernel (P x the useful MACs);
    'split' = mid/cross tap split (2/3 the MACs, one extra materialised
    shift tensor — ops/packed.py::packed_conv3x3_split). Same math."""
    features: int
    c_in: int
    use_bias: bool = False
    kernel_init: Callable = kaiming_normal_out
    impl: str = "block"

    @nn.compact
    def __call__(self, x, p: int):
        from ..ops.packed import packed_conv3x3_split
        conv = (packed_conv3x3_split
                if self.impl == "split" and p >= 2 else packed_conv3x3)
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, self.c_in, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if isinstance(x, (list, tuple)):
            out, off = None, 0
            for xp, c in x:
                y = conv(xp, kernel[:, :, off:off + c, :], c, p,
                         self.features)
                out = y if out is None else out + y
                off += c
            assert off == self.c_in, (off, self.c_in)
        else:
            out = conv(x, kernel, self.c_in, p, self.features)
        if bias is not None:
            out = out + jnp.tile(bias.astype(out.dtype), p)
        return out


class _ParamConv(nn.Module):
    """Bare parameter holder with nn.Conv's 1x1 param tree, for modules
    that apply the kernel in algebraically split form (the gate)."""
    features: int
    c_in: int
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_out

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (1, 1, self.c_in, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return k[0, 0], b


class PBatchNorm(nn.Module):
    """BatchNorm over a channel-split list of packed parts;
    param/stat-compatible with flax nn.BatchNorm(num_features).

    Statistics per true channel come from strided-lane reductions on each
    part (f32, fast-variance, optional pmean over cfg BN_AXIS_NAME —
    exactly flax's semantics), the running stats update uses flax's EMA
    form, and normalization is the folded per-channel affine applied
    packed."""
    num_features: int

    @nn.compact
    def __call__(self, parts: Sequence[Part], train: bool) -> List[jnp.ndarray]:
        nf = self.num_features
        assert sum(c for _, c, _ in parts) == nf, (parts, nf)
        scale = self.param("scale", nn.initializers.ones, (nf,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (nf,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((nf,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((nf,), jnp.float32))
        if train:
            axis_name = cfg.MODEL.get("BN_AXIS_NAME", None)
            means, variances = [], []
            for xp, c, _p in parts:
                m, v = packed_bn_stats(xp, c, axis_name=axis_name)
                means.append(m)
                variances.append(v)
            mean = jnp.concatenate(means)
            var = jnp.maximum(jnp.concatenate(variances), 0.0)
            if not self.is_initializing():
                mom = cfg.MODEL.BN_MOMENTUM
                ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
                ra_var.value = mom * ra_var.value + (1.0 - mom) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = scale * jax.lax.rsqrt(var + cfg.MODEL.BN_EPS)
        shift = bias - mean * inv
        out, off = [], 0
        for xp, c, _p in parts:
            out.append(packed_scale_bias(xp, inv[off:off + c],
                                         shift[off:off + c], c))
            off += c
        return out


class PResBasicBlock(nn.Module):
    """Packed ResNet BasicBlock; param-compatible with
    blocks.ResBasicBlock (conv1/bn1/conv2/bn2)."""
    planes: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    conv_impl: str = "block"  # PConv3x3.impl for both convs

    def setup(self):
        self.conv1 = PConv3x3(self.planes, self.planes, use_bias=False,
                              impl=self.conv_impl)
        self.bn1 = PBatchNorm(self.planes)
        self.conv2 = PConv3x3(self.planes, self.planes, use_bias=False,
                              impl=self.conv_impl)
        self.bn2 = PBatchNorm(self.planes)

    def __call__(self, xp, p: int, train: bool = True):
        residual = xp
        out = self.conv1(xp, p)
        out = self.bn1([(out, self.planes, p)], train)[0]
        out = self.act(out)
        out = self.conv2(out, p)
        out = self.bn2([(out, self.planes, p)], train)[0]
        return self.act(out + residual)


class _ParamConvTr(nn.Module):
    """Bare parameter holder with nn.ConvTranspose's (4, 4) param tree."""
    features: int
    c_in: int
    kernel_init: Callable = kaiming_normal_out

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (4, 4, self.c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class PConvBNRelu(nn.Module):
    """Packed Conv-BN-ReLU; param-compatible with blocks.ConvBNRelu
    (children Conv_0 / BatchNorm_0). kernel=3 keeps the pack (and accepts
    a channel-split part list); kernel=1 may repack (p_in -> p_out)."""
    features: int
    c_in: int
    kernel: int = 3
    act: Callable = nn.relu

    def setup(self):
        if self.kernel == 3:
            self.conv = PConv3x3(self.features, self.c_in, use_bias=True,
                                 name="Conv_0")
        else:
            self.conv = PConv1x1(self.features, self.c_in, use_bias=True,
                                 name="Conv_0")
        self.bn = PBatchNorm(self.features, name="BatchNorm_0")

    def __call__(self, x, p_in: int, p_out: int, train: bool = True):
        if self.kernel == 3:
            assert p_in == p_out, (p_in, p_out)
            y = self.conv(x, p_in)
        else:
            y = self.conv(x, p_in, p_out)
        y = self.bn([(y, self.features, p_out)], train)[0]
        return self.act(y)


class PConvTrBNRelu(nn.Module):
    """Packed ConvTranspose(4, 4, s2)-BN-ReLU 2x upsampler;
    param-compatible with blocks.ConvTransposeBNRelu (children
    ConvTranspose_0 / BatchNorm_0). Output pack is 2 * p_in."""
    features: int
    c_in: int
    act: Callable = nn.relu

    def setup(self):
        self.tr = _ParamConvTr(self.features, self.c_in,
                               name="ConvTranspose_0")
        self.bn = PBatchNorm(self.features, name="BatchNorm_0")

    def __call__(self, xp, p_in: int, train: bool = True):
        from ..ops.packed import packed_convtr4x2

        k, b = self.tr()
        y = packed_convtr4x2(xp, k.astype(xp.dtype), self.c_in, p_in,
                             self.features, bias=b)
        y = self.bn([(y, self.features, 2 * p_in)], train)[0]
        return self.act(y)


class PDecoderBlock(nn.Module):
    """Packed DecoderBlock (conv3x3-BN-ReLU then 2x transpose upsample);
    param-compatible with blocks.DecoderBlock (children conv / up)."""
    middle_channels: int
    out_channels: int
    c_in: int
    act: Callable = nn.relu

    def setup(self):
        self.conv = PConvBNRelu(self.middle_channels, self.c_in, kernel=3,
                                act=self.act, name="conv")
        self.up = PConvTrBNRelu(self.out_channels, self.middle_channels,
                                act=self.act, name="up")

    def __call__(self, xp, p: int, train: bool = True):
        return self.up(self.conv(xp, p, p, train), p, train)


def chained_pack(w: int, c: int, base: int) -> int:
    """Largest multiple of `base` that divides `w` with c * pack <= 128.
    Keeps every pack in a module's interior an integer multiple of its
    input pack, so PConv1x1 repacks and broadcast_1ch stay exact."""
    assert c * base <= 128, (
        f"chained_pack: base pack {base} x {c} channels already exceeds "
        f"the 128-lane invariant")
    assert base >= 1 and w % base == 0, (
        f"chained_pack: base pack {base} must divide width {w}")
    best = base
    p = base
    while True:
        p += base
        if p * c > 128:
            break
        if w % p == 0:
            best = p
    return best


class PSEModule(nn.Module):
    """Packed squeeze-and-excite; param-compatible with blocks.SEModule
    (children fc1 / fc2). The squeeze is a strided-lane reduction on the
    packed tensor; the tiny 1x1 excitation convs run on the (B, 1, 1, C)
    squeezed vector exactly as in the dense module; the scale is applied
    lane-tiled.

    Parity note: the squeeze accumulates in f32 (packed_channel_mean)
    while the dense SEModule's jnp.mean reduces in the model dtype — a
    deliberate divergence: under bfloat16 the packed squeeze is MORE
    accurate, so packed==dense is bit-exact in f32 (what the parity tests
    pin) but only near-equal in bf16."""
    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, xp, p: int):
        s = packed_channel_mean(xp, self.channels)  # (B, C) f32
        s = s[:, None, None, :].astype(xp.dtype)
        s = nn.Conv(self.channels // self.reduction, (1, 1),
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="fc1")(s)
        s = self.act(s)
        s = nn.Conv(self.channels, (1, 1), kernel_init=kaiming_normal_out,
                    dtype=self.dtype, name="fc2")(s)
        scale = nn.sigmoid(s)  # (B, 1, 1, C)
        return xp * jnp.tile(scale.astype(xp.dtype), (1, 1, 1, p))


class PSpatialAttentionBlock(nn.Module):
    """Packed spatial attention; param-compatible with
    blocks.SpatialAttentionBlock (children down / BatchNorm_0 / phi).
    The C/4-channel projection and the 1-channel map — both heavily
    lane-padded in the dense layout — stay packed throughout."""
    attn_features: int
    c_in: int
    act: Callable = nn.relu

    def setup(self):
        self.down = PConv1x1(self.attn_features, self.c_in, use_bias=False,
                             name="down")
        self.bn = PBatchNorm(self.attn_features, name="BatchNorm_0")
        self.phi = PConv1x1(1, self.attn_features, use_bias=True,
                            name="phi")

    def __call__(self, xp, p_in: int, p_mid: int, p_out: int,
                 train: bool = True):
        c = self.down(xp, p_in, p_mid)
        c = self.bn([(c, self.attn_features, p_mid)], train)[0]
        c = self.act(c)
        c = self.phi(c, p_mid, p_out)
        return nn.sigmoid(c)


class PDualAttBlock(nn.Module):
    """Packed decoder fusion block; param-compatible with
    blocks.DualAttBlock (children mrf_up / c3x3 / BatchNorm_0 /
    spatialAttn / channelAttn).

    The coarse/skip inputs stay dense — their channel counts fill the
    128 lanes — so the transposed-conv upsampler is the unchanged dense
    module. Everything from the channel-narrowing 3x3 fusion conv onward
    (outchannels <= 64 lanes, 2x padded dense; the attention interior's
    C/4- and 1-channel maps, 8-128x padded dense) runs lane-packed:

      * the fusion conv reads skip and up ONCE each and writes packed
        output directly (conv3x3_dense_to_packed) — neither the channel
        concat nor the lane-padded dense output ever reaches HBM;
      * BN / ReLU / SE / spatial attention all operate on full-lane
        packed tensors (same parameters, same math).

    Reference: the decoder half of SAUNet.forward,
    /root/reference/models/models.py:371-384 +
    attention_blocks.py:175-238."""
    outchannels: int
    c_in: int
    coarse_channels: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    def setup(self):
        from .blocks import ConvTransposeBNRelu
        self.mrf_up = ConvTransposeBNRelu(self.coarse_channels,
                                          dtype=self.dtype, act=self.act,
                                          name="mrf_up")
        self.c3x3 = _ParamConv3x3(self.outchannels, self.c_in,
                                  name="c3x3")
        self.bn = PBatchNorm(self.outchannels, name="BatchNorm_0")
        self.spatialAttn = PSpatialAttentionBlock(
            self.outchannels // 4, c_in=self.outchannels, act=self.act,
            name="spatialAttn")
        self.channelAttn = PSEModule(self.outchannels, 16,
                                     dtype=self.dtype, act=self.act,
                                     name="channelAttn")

    def __call__(self, inputs: Sequence[jnp.ndarray], p: int,
                 train: bool = True):
        """inputs = [coarse, skip] dense (coarse at half the skip's
        resolution) or a single pre-fused dense tensor. Returns
        (out packed at `p`, spatial map packed at the cue pack)."""
        if len(inputs) == 2:
            coarse, skip = inputs
            up = self.mrf_up(coarse, train)
            parts = [(skip, skip.shape[-1]), (up, up.shape[-1])]
        else:
            parts = [(inputs[0], inputs[0].shape[-1])]
        w = parts[0][0].shape[2]
        kernel, bias = self.c3x3()
        fused = conv3x3_dense_to_packed(parts, kernel.astype(self.dtype),
                                        p, self.outchannels, bias=bias)
        fused = self.bn([(fused, self.outchannels, p)], train)[0]
        fused = self.act(fused)
        p_mid = chained_pack(w, self.outchannels // 4, p)
        p_cue = chained_pack(w, 1, p_mid)
        spatial = self.spatialAttn(fused, p, p_mid, p_cue, train)
        channel = self.channelAttn(fused, p)
        out = channel * (broadcast_1ch(spatial, p_cue, self.outchannels, p)
                         + 1.0)
        return out, (spatial, p_cue)


class _ParamConv3x3(nn.Module):
    """Bare parameter holder with nn.Conv's (3, 3) param tree."""
    features: int
    c_in: int
    kernel_init: Callable = kaiming_normal_out

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (3, 3, self.c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class PGatedSpatialConv(nn.Module):
    """Packed shape-stream gate; param-compatible with
    blocks.GatedSpatialConv (gate_bn1/gate_conv1/gate_conv2/gate_bn2/conv).

    The dense computation concatenates the C-channel stream with the
    1-channel texture cue and pushes (C+1)-channel tensors through
    BN -> 1x1 -> relu -> 1x1 -> BN. Here the stream stays packed at
    (C, P) and the cue at (1, P_cue); the concat never happens — BN
    splits per channel and the 1x1 kernels split into C->C, cue->C,
    C->cue, cue->cue blocks (exact linear algebra, tested against the
    dense module)."""
    features: int
    c_in: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    def setup(self):
        c1 = self.c_in + 1
        self.gate_bn1 = PBatchNorm(c1)
        self.gate_conv1 = _ParamConv(c1, c1)
        self.gate_conv2 = _ParamConv(1, c1)
        self.gate_bn2 = PBatchNorm(1)
        self.conv = PConv1x1(self.features, self.c_in, use_bias=False,
                             kernel_init=xavier_normal)

    def __call__(self, ss, cue, p: int, p_cue: int, train: bool = True):
        c = self.c_in
        dt = ss.dtype
        nss, ncue = self.gate_bn1([(ss, c, p), (cue, 1, p_cue)], train)

        k1, b1 = self.gate_conv1()  # (C+1, C+1), (C+1,)
        k1 = k1.astype(dt)
        b1 = b1.astype(dt)
        # C-channel part of the (C+1)-wide hidden layer
        ga = packed_conv1x1(nss, k1[:c, :c], c, p, c, p)
        ga = ga + broadcast_1ch(ncue, p_cue, c, p) * jnp.tile(k1[c, :c], p)
        ga = self.act(ga + jnp.tile(b1[:c], p))
        # 1-channel (cue) part
        gb = packed_conv1x1(nss, k1[:c, c:], c, p, 1, p_cue)
        gb = self.act(gb + ncue * k1[c, c] + b1[c])

        k2, b2 = self.gate_conv2()  # (C+1, 1), (1,)
        k2 = k2.astype(dt)
        pre = packed_conv1x1(ga, k2[:c], c, p, 1, p_cue)
        pre = pre + gb * k2[c, 0] + b2.astype(dt)[0]
        pre = self.gate_bn2([(pre, 1, p_cue)], train)[0]
        alpha = nn.sigmoid(pre)

        gated = ss * (broadcast_1ch(alpha, p_cue, c, p) + 1.0)
        return self.conv(gated, p, p), alpha
