"""Measure the PyTorch-CPU baseline: one SAUNet train step (forward +
dual loss + backward + RAdam-style update) at 224², batch 1.

The reference itself cannot run in this image (it hard-requires torchvision's
pretrained densenet121 download and CUDA: /root/reference/models/models.py:271,
train.py:92), so this is an independent, equivalent torch implementation of
the same architecture (DenseNet-121 encoder w/o pool0, gated shape stream,
dual-attention decoder, edge fusion) used ONLY to produce the measured
denominator recorded in baseline_torch.json (consumed by bench.py) — the
configuration BASELINE.json calls config #1.

Run:  python tools/torch_baseline.py [--batch 1 --hw 224 --steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


def cbr(cin, cout, k=3):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=k // 2),
        nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class DenseLayer(nn.Module):
    def __init__(self, cin, growth=32, bn_size=4):
        super().__init__()
        self.net = nn.Sequential(
            nn.BatchNorm2d(cin), nn.ReLU(inplace=True),
            nn.Conv2d(cin, bn_size * growth, 1, bias=False),
            nn.BatchNorm2d(bn_size * growth), nn.ReLU(inplace=True),
            nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False))

    def forward(self, x):
        return torch.cat([x, self.net(x)], 1)


def dense_block(cin, n, growth=32):
    layers = []
    for i in range(n):
        layers.append(DenseLayer(cin + i * growth, growth))
    return nn.Sequential(*layers), cin + n * growth


def transition(cin, cout):
    return nn.Sequential(
        nn.BatchNorm2d(cin), nn.ReLU(inplace=True),
        nn.Conv2d(cin, cout, 1, bias=False), nn.AvgPool2d(2))


class Encoder(nn.Module):
    """DenseNet-121 trunk, pool0/relu0 dropped (SAUNet tap semantics)."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.norm0 = nn.BatchNorm2d(64)
        c = 64
        self.db1, c = dense_block(c, 6)
        self.t1 = transition(c, c // 2); c //= 2
        self.db2, c = dense_block(c, 12)
        self.t2 = transition(c, c // 2); c //= 2
        self.db3, c = dense_block(c, 24)
        self.t3 = transition(c, c // 2); c //= 2
        self.db4, c = dense_block(c, 16)
        self.norm5 = nn.BatchNorm2d(c)

    def forward(self, x):
        f1 = self.norm0(self.conv0(x))
        f2 = self.t1(self.db1(f1))
        f3 = self.t2(self.db2(f2))
        f4 = self.t3(self.db3(f3))
        f5 = self.norm5(self.db4(f4))
        return f1, f2, f3, f4, f5


class SE(nn.Module):
    def __init__(self, c, r=16):
        super().__init__()
        self.fc1 = nn.Conv2d(c, c // r, 1)
        self.fc2 = nn.Conv2d(c // r, c, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class SpatialAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.down = nn.Conv2d(c, c // 4, 1, bias=False)
        self.bn = nn.BatchNorm2d(c // 4)
        self.phi = nn.Conv2d(c // 4, 1, 1)

    def forward(self, x):
        return torch.sigmoid(self.phi(F.relu(self.bn(self.down(x)))))


class DualAtt(nn.Module):
    def __init__(self, c_coarse, c_skip, cout):
        super().__init__()
        self.up = nn.Sequential(
            nn.ConvTranspose2d(c_coarse, c_coarse, 4, 2, 1),
            nn.BatchNorm2d(c_coarse), nn.ReLU(inplace=True))
        self.fuse = cbr(c_coarse + c_skip, cout)
        self.se = SE(cout)
        self.sp = SpatialAttn(cout)

    def forward(self, coarse, skip):
        x = self.fuse(torch.cat([skip, self.up(coarse)], 1))
        return self.se(x) * (1 + self.sp(x))


class Gate(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.gate = nn.Sequential(
            nn.BatchNorm2d(c + 1), nn.Conv2d(c + 1, c + 1, 1),
            nn.ReLU(inplace=True), nn.Conv2d(c + 1, 1, 1),
            nn.BatchNorm2d(1), nn.Sigmoid())
        self.conv = nn.Conv2d(c, c, 1, bias=False)

    def forward(self, x, cue):
        a = self.gate(torch.cat([x, cue], 1))
        return self.conv(x * (a + 1))


class ResBlk(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c1 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.b1 = nn.BatchNorm2d(c)
        self.c2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.b2 = nn.BatchNorm2d(c)

    def forward(self, x):
        h = F.relu(self.b1(self.c1(x)))
        return F.relu(x + self.b2(self.c2(h)))


def _canny_torch(gray, low=10.0, high=100.0, iters=8):
    """Torch mirror of saunet_tpu.ops.edge.canny_edges (Sobel -> L1 mag ->
    direction-quantised NMS -> double threshold -> unrolled hysteresis),
    used by the deterministic fidelity gate so both frameworks compute the
    SAME edge cue from the same input. NHW1-equivalent on NCHW (N,1,H,W)."""
    kx = torch.tensor([[[[-1., 0, 1], [-2., 0, 2], [-1., 0, 1]]]],
                      dtype=gray.dtype)
    ky = kx.transpose(2, 3)
    gx = F.conv2d(gray, kx, padding=1)
    gy = F.conv2d(gray, ky, padding=1)
    mag = gx.abs() + gy.abs()

    def shift(x, dy, dx):
        return F.pad(x, (max(dx, 0), max(-dx, 0),
                         max(dy, 0), max(-dy, 0)))[
            :, :,
            max(-dy, 0):x.shape[2] + max(-dy, 0),
            max(-dx, 0):x.shape[3] + max(-dx, 0)]

    ax, ay = gx.abs(), gy.abs()
    tan225, tan675 = 0.4142135623730951, 2.414213562373095
    horiz = ay <= tan225 * ax
    vert = ay >= tan675 * ax
    same_sign = (gx * gy) >= 0
    keep_h = (mag >= shift(mag, 0, -1)) & (mag >= shift(mag, 0, 1))
    keep_v = (mag >= shift(mag, -1, 0)) & (mag >= shift(mag, 1, 0))
    keep_d1 = (mag >= shift(mag, -1, -1)) & (mag >= shift(mag, 1, 1))
    keep_d2 = (mag >= shift(mag, -1, 1)) & (mag >= shift(mag, 1, -1))
    keep = torch.where(horiz, keep_h,
                       torch.where(vert, keep_v,
                                   torch.where(same_sign, keep_d1, keep_d2)))
    nms = torch.where(keep, mag, torch.zeros_like(mag))
    strong = (nms > high).float()
    weak = (nms > low).float()
    edges = strong
    for _ in range(iters):
        grown = F.max_pool2d(edges, 3, stride=1, padding=1)
        edges = torch.maximum(edges, grown * weak)
    return edges * 255.0


def _gray255_torch(x):
    """Torch mirror of ops.edge.image_to_gray255: per-sample rescale of the
    channel mean to [0, 255]."""
    g = x.mean(1, keepdim=True)
    lo = g.amin((1, 2, 3), keepdim=True)
    hi = g.amax((1, 2, 3), keepdim=True)
    return (g - lo) / (hi - lo + 1e-8) * 255.0


class TorchSAUNet(nn.Module):
    def __init__(self, num_classes=4, nf=32, edge_cue="sobel"):
        super().__init__()
        self.edge_cue = edge_cue
        self.enc = Encoder()
        up = lambda t, s: F.interpolate(t, size=s, mode="bilinear",
                                        align_corners=True)
        self._up = up
        self.d0 = nn.Conv2d(128, 64, 1)
        self.res1, self.d1 = ResBlk(64), nn.Conv2d(64, 32, 1)
        self.res2, self.d2 = ResBlk(32), nn.Conv2d(32, 16, 1)
        self.res3, self.d3 = ResBlk(16), nn.Conv2d(16, 8, 1)
        self.c3 = nn.Conv2d(256, 1, 1)
        self.c4 = nn.Conv2d(512, 1, 1)
        self.c5 = nn.Conv2d(1024, 1, 1)
        self.g1, self.g2, self.g3 = Gate(32), Gate(16), Gate(8)
        self.fuse = nn.Conv2d(8, 1, 1, bias=False)
        self.cw = nn.Conv2d(2, 1, 1, bias=False)
        self.expand = cbr(1, nf, k=1)
        self.center = cbr(1024, nf * 16)
        self.dec5 = DualAtt(nf * 16, 1024, 512)
        self.dec4 = DualAtt(512, 512, 256)
        self.dec3 = DualAtt(256, 256, 128)
        self.dec2 = DualAtt(128, 128, 64)
        self.dec1 = nn.Sequential(
            cbr(64, 48), nn.ConvTranspose2d(48, nf, 4, 2, 1),
            nn.BatchNorm2d(nf), nn.ReLU(inplace=True))
        self.dec0 = cbr(nf * 2, nf)
        self.final = nn.Conv2d(nf, num_classes, 1)

    def forward(self, x):
        s = x.shape[2:]
        f1, f2, f3, f4, f5 = self.enc(x)
        up = self._up

        ss = self.res1(up(self.d0(f2), s))
        ss = self.g1(self.d1(ss), up(self.c3(f3), s))
        ss = self.g2(self.d2(self.res2(ss)), up(self.c4(f4), s))
        ss = self.g3(self.d3(self.res3(ss)), up(self.c5(f5), s))
        edge_out = torch.sigmoid(self.fuse(ss))

        if self.edge_cue == "canny":
            # exact mirror of the framework's on-device edge operator
            # (ops/edge.py) — the deterministic fidelity configuration
            canny = _canny_torch(_gray255_torch(x)).detach()
        else:
            # stand-in cue (the CPU-Canny of the reference): sobel magnitude
            gray = x.mean(1, keepdim=True)
            kx = torch.tensor([[[[-1., 0, 1], [-2., 0, 2], [-1., 0, 1]]]])
            gx = F.conv2d(gray, kx, padding=1)
            gy = F.conv2d(gray, kx.transpose(2, 3), padding=1)
            canny = (gx.abs() + gy.abs()).detach()

        acts = torch.sigmoid(self.cw(torch.cat([edge_out, canny], 1)))
        edge = self.expand(acts)

        f2u = up(f2, (f2.shape[2] * 2, f2.shape[3] * 2))
        f3u = up(f3, (f3.shape[2] * 2, f3.shape[3] * 2))
        f4u = up(f4, (f4.shape[2] * 2, f4.shape[3] * 2))
        center = self.center(F.max_pool2d(f5, 2))
        d5 = self.dec5(center, f5)
        d4 = self.dec4(d5, f4u)
        d3 = self.dec3(d4, f3u)
        d2 = self.dec2(d3, f2u)
        d1 = self.dec1(d2)
        d0 = self.dec0(torch.cat([d1, edge], 1))
        return self.final(d0), edge_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "baseline_torch.json"))
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchSAUNet()
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    ce = nn.CrossEntropyLoss(weight=torch.tensor([1.0, 4.0, 5.0, 1.0]))
    bce = nn.BCELoss()

    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.randn(args.batch, 3, args.hw, args.hw)
                         .astype(np.float32))
    y = torch.from_numpy(rs.randint(0, 4, size=(args.batch, args.hw, args.hw))
                         .astype(np.int64))
    e = torch.from_numpy((rs.rand(args.batch, 1, args.hw, args.hw) > 0.8)
                         .astype(np.float32))

    def step():
        opt.zero_grad()
        seg, edge = model(x)
        probs = F.softmax(seg, 1)
        one_hot = F.one_hot(y, 4).permute(0, 3, 1, 2).float()
        inter = (probs * one_hot).sum((0, 2, 3))
        card = (probs + one_hot).sum((0, 2, 3))
        dice = 1 - (2 * inter / (card + 1e-7)).mean()
        loss = ce(seg, y) + dice + bce(edge.clamp(1e-7, 1 - 1e-7), e)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    sps = args.batch * args.steps / dt

    result = {
        "train_slices_per_sec": sps,
        "config": {"batch": args.batch, "hw": args.hw, "steps": args.steps,
                   "device": "cpu", "threads": torch.get_num_threads()},
        "note": "equivalent torch implementation; reference itself cannot "
                "run here (needs torchvision download + CUDA)",
    }
    out = os.path.abspath(args.out)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
