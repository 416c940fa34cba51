"""SAUNet: Shape-Attentive U-Net, assembled TPU-first (NHWC, flax).

Mirrors the architecture of /root/reference/models/models.py:264-394 —
DenseNet-121 encoder (pool0 dropped), four dual-attention decoder blocks, a
gated full-resolution shape stream, edge fusion, 1x1 classifier head — with
one deliberate deviation: the reference's per-forward CPU round-trip to
cv2.Canny (/root/reference/models/models.py:359-364) is replaced by the
on-device edge operator (XLA or fused Pallas kernel), so the entire forward
is a single compiled program.

Channel/resolution contract for 256² inputs (SURVEY.md §3.3):
  encoder:  f1 64@128², f2 128@64², f3 256@32², f4 512@16², f5 1024@16²
  shape stream: 64 -> 32 -> 16 -> 8 channels, all at 256²
  decoder:  center 512@8², dec5 512@16², dec4 256@32², dec3 128@64²,
            dec2 64@128², dec1 32@256², head num_classes@256²

The module is setup()-style so the decoder can run standalone
(`model.apply(vars, taps, x, method=SAUNet.decode)`) — the eval/inference
path feeds it encoder taps produced by the fused Pallas dense-block
kernels (saunet_tpu.models.fused_encoder) instead of the XLA encoder.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.edge import canny_edges, image_to_gray255
from ..ops.resize import resize_bilinear
from .blocks import (
    ConvBNRelu,
    DecoderBlock,
    DualAttBlock,
    GatedSpatialConv,
    ResBasicBlock,
    kaiming_normal_out,
    max_pool_2x2,
)
from .densenet import DenseNetEncoder

Dtype = Any


class SAUNet(nn.Module):
    num_classes: int = 4
    num_filters: int = 32
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    # Edge operator thresholds (cv2.Canny(10, 100) in the reference).
    canny_low: float = 10.0
    canny_high: float = 100.0
    # 'auto': fused Pallas kernel on TPU, XLA ops elsewhere.
    edge_kernel: str = "auto"
    # rematerialise encoder dense blocks (memory for FLOPs)
    remat: bool = False
    # 'chain' or 'buffer': see DenseBlock.concat_mode (train-path HBM
    # traffic lever; same math, same checkpoint layout)
    encoder_concat: str = "chain"
    # 'xla': dense NHWC stream ops. 'packed': lane-packed layout
    # (models/packed_stream.py) — same math and parameter tree, ~P-fold
    # less HBM traffic for the full-res narrow-channel stream tensors.
    stream_impl: str = "xla"

    def setup(self):
        dt, act = self.dtype, self.act
        conv1x1 = lambda ch: nn.Conv(  # noqa: E731
            ch, (1, 1), kernel_init=kaiming_normal_out, dtype=dt)

        self.encoder = DenseNetEncoder(dtype=dt, act=act, remat=self.remat,
                                       concat_mode=self.encoder_concat)

        # shape stream — low-resolution projections (d0, c3-c5) are dense
        # in both impls; only the full-resolution modules swap layout.
        self.d0 = conv1x1(64)
        self.c3 = conv1x1(1)
        self.c4 = conv1x1(1)
        self.c5 = conv1x1(1)
        if self.stream_impl == "packed":
            from .packed_stream import (
                PConv1x1,
                PGatedSpatialConv,
                PResBasicBlock,
            )
            self.res1 = PResBasicBlock(64, dtype=dt, act=act)
            self.d1 = PConv1x1(32, c_in=64)
            self.gate1 = PGatedSpatialConv(32, c_in=32, dtype=dt, act=act)
            self.res2 = PResBasicBlock(32, dtype=dt, act=act)
            self.d2 = PConv1x1(16, c_in=32)
            self.gate2 = PGatedSpatialConv(16, c_in=16, dtype=dt, act=act)
            self.res3 = PResBasicBlock(16, dtype=dt, act=act)
            self.d3 = PConv1x1(8, c_in=16)
            self.gate3 = PGatedSpatialConv(8, c_in=8, dtype=dt, act=act)
            self.fuse = PConv1x1(1, c_in=8, use_bias=False)
        elif self.stream_impl == "xla":
            self.res1 = ResBasicBlock(64, dtype=dt, act=act)
            self.d1 = conv1x1(32)
            self.gate1 = GatedSpatialConv(32, dtype=dt, act=act)
            self.res2 = ResBasicBlock(32, dtype=dt, act=act)
            self.d2 = conv1x1(16)
            self.gate2 = GatedSpatialConv(16, dtype=dt, act=act)
            self.res3 = ResBasicBlock(16, dtype=dt, act=act)
            self.d3 = conv1x1(8)
            self.gate3 = GatedSpatialConv(8, dtype=dt, act=act)
            self.fuse = nn.Conv(1, (1, 1), use_bias=False,
                                kernel_init=kaiming_normal_out, dtype=dt)
        else:
            raise ValueError(f"stream_impl must be 'xla' or 'packed', "
                             f"got {self.stream_impl!r}")

        # decoder trunk (dual attention). Packed models run the
        # param-compatible packed blocks: the concat and the lane-padded
        # narrow outputs / attention interiors never reach HBM (dec5-dec3
        # keep their lane-full main tensors dense via pack=1; dec2's
        # 64-channel output is truly packed).
        self.center = ConvBNRelu(self.num_filters * 16, kernel=3, dtype=dt,
                                 act=act)
        if self.stream_impl == "packed":
            from .packed_stream import PDualAttBlock
            # dec5's coarse input is the center block's num_filters*16
            # channels (1024 = the fixed DenseNet conv5 skip); deriving it
            # keeps the packed param tree checkpoint-interchangeable with
            # the dense one for any num_filters, not just the default 32
            nf16 = self.num_filters * 16
            self.dec5 = PDualAttBlock(512, c_in=nf16 + 1024,
                                      coarse_channels=nf16,
                                      dtype=dt, act=act)
            self.dec4 = PDualAttBlock(256, c_in=1024, coarse_channels=512,
                                      dtype=dt, act=act)
            self.dec3 = PDualAttBlock(128, c_in=512, coarse_channels=256,
                                      dtype=dt, act=act)
            self.dec2 = PDualAttBlock(64, c_in=256, coarse_channels=128,
                                      dtype=dt, act=act)
        else:
            self.dec5 = DualAttBlock(512, dtype=dt, act=act)
            self.dec4 = DualAttBlock(256, dtype=dt, act=act)
            self.dec3 = DualAttBlock(128, dtype=dt, act=act)
            self.dec2 = DualAttBlock(64, dtype=dt, act=act)

        # edge fusion + full-resolution tail — packed or dense
        if self.stream_impl == "packed":
            from .packed_stream import (
                PConv1x1,
                PConvBNRelu,
                PDecoderBlock,
                _ParamConv,
            )
            self.cw = _ParamConv(1, c_in=2, use_bias=False)
            self.expand = PConvBNRelu(self.num_filters, c_in=1, kernel=1,
                                      act=act)
            self.dec1 = PDecoderBlock(48, self.num_filters, c_in=64,
                                      act=act)
            self.dec0 = PConvBNRelu(self.num_filters,
                                    c_in=self.num_filters * 2, kernel=3,
                                    act=act)
            self.final = PConv1x1(self.num_classes,
                                  c_in=self.num_filters)
        else:
            self.cw = nn.Conv(1, (1, 1), use_bias=False,
                              kernel_init=kaiming_normal_out, dtype=dt)
            self.expand = ConvBNRelu(self.num_filters, kernel=1, dtype=dt,
                                     act=act)
            self.dec1 = DecoderBlock(48, self.num_filters, dtype=dt,
                                     act=act)
            self.dec0 = ConvBNRelu(self.num_filters, kernel=3, dtype=dt,
                                   act=act)
            self.final = nn.Conv(self.num_classes, (1, 1),
                                 kernel_init=kaiming_normal_out, dtype=dt)

    def _canny(self, gray):
        # Gradient must stop BEFORE the kernel, not at its output: saliency
        # differentiates w.r.t. the image, and an unknown input tangent
        # entering pallas_call (no autodiff rule) fails linearization even
        # when the output feeds stop_gradient. The reference's cv2 Canny is
        # equally gradient-opaque (train.py edge prior is numpy data).
        gray = jax.lax.stop_gradient(gray)
        # The fused whole-image kernel holds ~18 live (H, W) f32 buffers in
        # VMEM; above ~220k pixels (448²) it exceeds the ~16 MiB budget and
        # the row-tiled kernel (halo'd DMA bands, bit-identical output)
        # takes over. XLA fallback only if no tile size divides H.
        h, w = gray.shape[1], gray.shape[2]
        fits_vmem = h * w <= 220_000
        use_pallas = self.edge_kernel == "pallas" or (
            self.edge_kernel == "auto"
            and jax.default_backend() not in ("cpu", "gpu"))
        if use_pallas:
            from ..ops.pallas.canny import (
                canny_edges_pallas,
                canny_edges_pallas_tiled,
                pick_tile_rows,
            )
            if fits_vmem:
                return canny_edges_pallas(gray, self.canny_low,
                                          self.canny_high)
            tile_rows = pick_tile_rows(h, w)
            if tile_rows is not None:
                return canny_edges_pallas_tiled(
                    gray, self.canny_low, self.canny_high,
                    tile_rows=tile_rows)
        return canny_edges(gray, self.canny_low, self.canny_high)

    def __call__(self, x, train: bool = True, return_att: bool = False):
        x = x.astype(self.dtype)
        conv1, conv2, conv3, conv4, conv5 = self.encoder(x, train)
        del conv1  # tapped for saliency hooks only in the reference
        return self.decode((conv2, conv3, conv4, conv5), x, train,
                           return_att)

    def shape_stream(self, taps, x, train: bool = True):
        """The gated full-resolution shape stream: (f2..f5, x) ->
        (edge_out f32 in (0,1), (g1, g2, g3) gate maps)."""
        if self.stream_impl == "packed":
            return self._shape_stream_packed(taps, x, train)
        conv2, conv3, conv4, conv5 = taps
        h, w = x.shape[1], x.shape[2]
        ss = self.d0(conv2)
        ss = resize_bilinear(ss, (h, w))
        ss = self.res1(ss, train)
        ss = self.d1(ss)
        c3 = resize_bilinear(self.c3(conv3), (h, w))
        ss, g1 = self.gate1(ss, c3, train)
        ss = self.res2(ss, train)
        ss = self.d2(ss)
        c4 = resize_bilinear(self.c4(conv4), (h, w))
        ss, g2 = self.gate2(ss, c4, train)
        ss = self.res3(ss, train)
        ss = self.d3(ss)
        c5 = resize_bilinear(self.c5(conv5), (h, w))
        ss, g3 = self.gate3(ss, c5, train)
        ss = self.fuse(ss)
        return nn.sigmoid(ss.astype(jnp.float32)), (g1, g2, g3)

    def _shape_stream_packed(self, taps, x, train: bool = True):
        """shape_stream contract (dense edge map + dense gate maps) on
        top of the packed core."""
        from ..ops.packed import unpack

        edge_p, gates_p = self._shape_stream_packed_core(taps, x, train)
        return unpack(edge_p, 1), tuple(unpack(g, 1) for g in gates_p)

    def _shape_stream_packed_core(self, taps, x, train: bool = True):
        """shape_stream in the lane-packed layout (same modules-by-name,
        same parameters, same math — see models/packed_stream.py). The
        full-resolution stream tensors live as (B, H, W/P, P*C) arrays
        with full 128 lanes instead of lane-padded narrow maps. Returns
        the packed (1-channel @ pk[1]) edge map and gate maps."""
        from ..ops.packed import resize_bilinear_packed
        from .packed_stream import stream_packs

        conv2, conv3, conv4, conv5 = taps
        h, w = x.shape[1], x.shape[2]
        pk = stream_packs(w)
        p1 = pk[1]
        ss = resize_bilinear_packed(self.d0(conv2), (h, w), pk[64])
        ss = self.res1(ss, pk[64], train)
        ss = self.d1(ss, pk[64], pk[32])
        c3 = resize_bilinear_packed(self.c3(conv3), (h, w), p1)
        ss, g1 = self.gate1(ss, c3, pk[32], p1, train)
        ss = self.res2(ss, pk[32], train)
        ss = self.d2(ss, pk[32], pk[16])
        c4 = resize_bilinear_packed(self.c4(conv4), (h, w), p1)
        ss, g2 = self.gate2(ss, c4, pk[16], p1, train)
        ss = self.res3(ss, pk[16], train)
        ss = self.d3(ss, pk[16], pk[8])
        c5 = resize_bilinear_packed(self.c5(conv5), (h, w), p1)
        ss, g3 = self.gate3(ss, c5, pk[8], p1, train)
        ss = self.fuse(ss, pk[8], p1)
        return nn.sigmoid(ss.astype(jnp.float32)), (g1, g2, g3)

    def shape_stream_inputs(self, taps, x):
        """XLA precompute for the fused shape-stream kernel: the resized
        64-ch projection of f2 plus the three 1-ch texture cues, packed
        into ONE (N, H, W, 67) tensor so only a single full-resolution
        XLA pass exists (narrow-channel tensors pad to 128 lanes in HBM,
        so each separate full-res map would cost a full padded pass)."""
        conv2, conv3, conv4, conv5 = taps
        h, w = x.shape[1], x.shape[2]
        r0 = resize_bilinear(self.d0(conv2), (h, w))
        c3 = resize_bilinear(self.c3(conv3), (h, w))
        c4 = resize_bilinear(self.c4(conv4), (h, w))
        c5 = resize_bilinear(self.c5(conv5), (h, w))
        return jnp.concatenate([r0, c3, c4, c5], axis=-1)

    def _dualatt_decoder(self, taps, train: bool):
        """The dual-attention decoder trunk (center .. dec2) shared by the
        dense and packed tails. Returns (dec2, (att2..att5))."""
        conv2, conv3, conv4, conv5 = taps
        conv2u = resize_bilinear(conv2,
                                 (conv2.shape[1] * 2, conv2.shape[2] * 2))
        conv3u = resize_bilinear(conv3,
                                 (conv3.shape[1] * 2, conv3.shape[2] * 2))
        conv4u = resize_bilinear(conv4,
                                 (conv4.shape[1] * 2, conv4.shape[2] * 2))

        center = self.center(max_pool_2x2(conv5), train)
        dec5, att5 = self.dec5([center, conv5], train)
        dec4, att4 = self.dec4([dec5, conv4u], train)
        dec3, att3 = self.dec3([dec4, conv3u], train)
        dec2, att2 = self.dec2([dec3, conv2u], train)
        return dec2, (att2, att3, att4, att5)

    def _dualatt_decoder_packed(self, taps, p2: int, train: bool):
        """The dual-attention trunk on the packed blocks. dec5-dec3 use
        pack=1 (their outputs fill the lanes; only the attention
        interiors pack); dec2 emits its 64-channel output packed at `p2`
        — exactly the pack its consumer (the packed dec1) expects, so
        the lane-padded dense dec2 tensor and the subsequent pack() pass
        both disappear. Returns (dec2 packed, dense atts)."""
        from ..ops.packed import unpack

        conv2, conv3, conv4, conv5 = taps
        conv2u = resize_bilinear(conv2,
                                 (conv2.shape[1] * 2, conv2.shape[2] * 2))
        conv3u = resize_bilinear(conv3,
                                 (conv3.shape[1] * 2, conv3.shape[2] * 2))
        conv4u = resize_bilinear(conv4,
                                 (conv4.shape[1] * 2, conv4.shape[2] * 2))

        center = self.center(max_pool_2x2(conv5), train)
        dec5, att5 = self.dec5([center, conv5], 1, train)
        dec4, att4 = self.dec4([dec5, conv4u], 1, train)
        dec3, att3 = self.dec3([dec4, conv3u], 1, train)
        dec2, att2 = self.dec2([dec3, conv2u], p2, train)
        atts = tuple(unpack(a, 1) for a, _pc in (att2, att3, att4, att5))
        return dec2, atts

    @staticmethod
    def _upsampled_atts(atts, gates):
        att2, att3, att4, att5 = atts
        return [
            resize_bilinear(att2, (att2.shape[1] * 2, att2.shape[2] * 2)),
            resize_bilinear(att3, (att3.shape[1] * 4, att3.shape[2] * 4)),
            resize_bilinear(att4, (att4.shape[1] * 8, att4.shape[2] * 8)),
            resize_bilinear(att5, (att5.shape[1] * 16, att5.shape[2] * 16)),
            *gates,
        ]

    def decode(self, taps, x, train: bool = True, return_att: bool = False,
               edge_out=None):
        """Everything after the encoder: shape stream, edge fusion,
        dual-attention decoder, classifier head. `taps` = (f2, f3, f4, f5)
        at 1/4..1/16 resolution; `x` is the network input (for the edge
        operator). Standalone entry point for the fused-encoder eval path;
        `edge_out` short-circuits the shape stream when the fused Pallas
        kernel already produced it (eval only, no gate maps).
        """
        if edge_out is not None and return_att:
            raise ValueError("return_att needs the XLA shape stream "
                             "(gate maps); do not pass edge_out")
        dt = self.dtype
        x = x.astype(dt)

        if self.stream_impl == "packed":
            from ..ops.packed import unpack
            seg_p, edge_p, gates_p, atts = self._decode_packed(
                taps, x, train, edge_out=edge_out)
            x_out = unpack(seg_p, self.num_classes).astype(jnp.float32)
            if edge_out is None:
                edge_out = unpack(edge_p, 1)
            if return_att:
                gates = tuple(unpack(g, 1) for g in gates_p)
                return x_out, edge_out, self._upsampled_atts(atts, gates)
            return x_out, edge_out

        # --- Shape stream (full-res, tiny channels) ----------------------
        gates = ()
        if edge_out is None:
            edge_out, gates = self.shape_stream(taps, x, train)

        # --- On-device edge detection (replaces CPU Canny) ---------------
        gray = image_to_gray255(x)
        canny = jax.lax.stop_gradient(self._canny(gray)).astype(dt)

        cat = jnp.concatenate([edge_out.astype(dt), canny], axis=-1)
        acts = nn.sigmoid(self.cw(cat))
        edge = self.expand(acts, train)

        dec2, atts = self._dualatt_decoder(taps, train)
        dec1 = self.dec1(dec2, train)
        dec0 = self.dec0(jnp.concatenate([dec1, edge], axis=-1), train)

        x_out = self.final(dec0).astype(jnp.float32)

        if return_att:
            return x_out, edge_out, self._upsampled_atts(atts, gates)
        return x_out, edge_out

    def _decode_packed(self, taps, x, train: bool, edge_out=None):
        """The lane-packed tail: edge fusion, dec1/dec0/final and the
        classifier head all run in packed layout — the padded full-res
        32-channel maps and the 32x-padded (N, H, W, C) logits never
        reach HBM. Returns (seg_packed, edge_packed, gate_maps_packed,
        atts)."""
        from ..ops.packed import pack
        from .packed_stream import stream_packs

        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        pk = stream_packs(w)
        p1, p32 = pk[1], pk[32]
        if p32 % 2 != 0:
            raise ValueError(
                f"stream_impl='packed' needs an even input width with a "
                f"2-divisible 32-channel pack; got width {w} (packs {pk}). "
                f"Use stream_impl='xla' for this geometry.")
        nf = self.num_filters

        if edge_out is None:
            edge_p, gates_p = self._shape_stream_packed_core(taps, x, train)
        else:
            edge_p = pack(edge_out.astype(jnp.float32), p1)
            gates_p = ()

        gray = image_to_gray255(x)
        canny_p = pack(
            jax.lax.stop_gradient(self._canny(gray)).astype(dt), p1)
        kcw, _ = self.cw()
        kcw = kcw.astype(dt)
        acts = nn.sigmoid(edge_p.astype(dt) * kcw[0, 0] + canny_p * kcw[1, 0])
        edge = self.expand(acts, p1, p32, train)  # nf channels @ p32

        dec2, atts = self._dualatt_decoder_packed(taps, p32 // 2, train)
        dec1 = self.dec1(dec2, p32 // 2, train)
        dec0 = self.dec0([(dec1, nf), (edge, nf)], p32, p32, train)

        # classifier head straight into the packed logits layout: the
        # largest lane-filling multiple of p32 that divides the width
        pseg, mult = p32, p32
        while (mult + p32) * self.num_classes <= 128:
            mult += p32
            if w % mult == 0:
                pseg = mult
        seg_p = self.final(dec0, p32, pseg)
        return seg_p, edge_p, gates_p, atts

    def train_outputs(self, x, train: bool = True):
        """Forward pass emitting (seg, edge) in the layout the train loss
        consumes: lane-packed for stream_impl='packed' (losses.
        dual_loss_packed), dense otherwise. The packed path never
        materialises the 32x-lane-padded dense logits."""
        if self.stream_impl != "packed":
            return self(x, train)
        x = x.astype(self.dtype)
        _, f2, f3, f4, f5 = self.encoder(x, train)
        seg_p, edge_p, _, _ = self._decode_packed((f2, f3, f4, f5), x,
                                                  train)
        return seg_p, edge_p
