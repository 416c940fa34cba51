"""Full-model weight port: TorchSAUNet state_dict -> flax SAUNet variables.

The round-2 fidelity gate was statistical (different inits, ±0.15 IoU band).
This module makes it deterministic: the torch baseline's *entire* parameter
set (tools/torch_baseline.py::TorchSAUNet — the independent rewrite of
/root/reference/models/models.py:264-394) is ported onto this framework's
SAUNet pytree, so both frameworks can start from IDENTICAL weights and their
per-step loss trajectories compared within floating-point tolerance.

Porting rules (each pinned by its own test):
  * conv kernels: OIHW -> HWIO via transpose(2, 3, 1, 0)
  * ConvTranspose kernels: torch (in, out, kh, kw) -> HWIO via
    transpose(2, 3, 0, 1) + flip of both spatial axes
    (tests/test_convtranspose_parity.py)
  * BatchNorm: weight->scale, bias->bias, running_{mean,var}->{mean,var}
  * encoder: reuses densenet.port_torchvision_state_dict after renaming the
    torch Encoder's keys to torchvision `features.*` names
    (tests/test_cross_framework_parity.py pins that path).
"""
from __future__ import annotations

import numpy as np

from .densenet import port_torchvision_state_dict

DENSENET_BLOCK_SIZES = {1: 6, 2: 12, 3: 24, 4: 16}


def _np(v):
    try:  # torch tensor
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def _put(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def encoder_to_torchvision_names(sd: dict, prefix: str = "enc.") -> dict:
    """Rename tools/torch_baseline.py::Encoder keys (conv0/norm0/dbN/tN/
    norm5) to torchvision densenet121 `features.*` names so the existing
    encoder port ingests them."""
    out = {}
    out["features.conv0.weight"] = sd[f"{prefix}conv0.weight"]
    for f in ("weight", "bias", "running_mean", "running_var"):
        out[f"features.norm0.{f}"] = sd[f"{prefix}norm0.{f}"]
        out[f"features.norm5.{f}"] = sd[f"{prefix}norm5.{f}"]
    # DenseLayer.net: 0=BN, 1=ReLU, 2=conv1, 3=BN, 4=ReLU, 5=conv2
    for b, n in DENSENET_BLOCK_SIZES.items():
        for l in range(n):
            src = f"{prefix}db{b}.{l}.net"
            dst = f"features.denseblock{b}.denselayer{l + 1}"
            for f in ("weight", "bias", "running_mean", "running_var"):
                out[f"{dst}.norm1.{f}"] = sd[f"{src}.0.{f}"]
                out[f"{dst}.norm2.{f}"] = sd[f"{src}.3.{f}"]
            out[f"{dst}.conv1.weight"] = sd[f"{src}.2.weight"]
            out[f"{dst}.conv2.weight"] = sd[f"{src}.5.weight"]
    # transition: 0=BN, 1=ReLU, 2=conv, 3=pool
    for t in (1, 2, 3):
        src, dst = f"{prefix}t{t}", f"features.transition{t}"
        for f in ("weight", "bias", "running_mean", "running_var"):
            out[f"{dst}.norm.{f}"] = sd[f"{src}.0.{f}"]
        out[f"{dst}.conv.weight"] = sd[f"{src}.2.weight"]
    return {k: _np(v) for k, v in out.items()}


def port_torch_saunet_state_dict(state_dict) -> dict:
    """Map a TorchSAUNet state_dict onto SAUNet(stream_impl='xla')
    {'params', 'batch_stats'} pytrees (numpy leaves; pass through
    jax.device_put / directly into model.apply)."""
    sd = {k: _np(v) for k, v in dict(state_dict).items()}
    params: dict = {}
    stats: dict = {}

    def conv(src, dst, bias=True):
        _put(params, dst + ("kernel",),
             np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0)))
        if bias:
            _put(params, dst + ("bias",), sd[f"{src}.bias"])

    def convT(src, dst, bias=True):
        k = np.transpose(sd[f"{src}.weight"], (2, 3, 0, 1))[::-1, ::-1]
        _put(params, dst + ("kernel",), k.copy())
        if bias:
            _put(params, dst + ("bias",), sd[f"{src}.bias"])

    def bn(src, dst):
        _put(params, dst + ("scale",), sd[f"{src}.weight"])
        _put(params, dst + ("bias",), sd[f"{src}.bias"])
        _put(stats, dst + ("mean",), sd[f"{src}.running_mean"])
        _put(stats, dst + ("var",), sd[f"{src}.running_var"])

    # --- encoder (via the pinned torchvision-name path) -------------------
    enc_vars = port_torchvision_state_dict(encoder_to_torchvision_names(sd))
    params["encoder"] = enc_vars["params"]
    stats["encoder"] = enc_vars["batch_stats"]

    # --- shape stream ------------------------------------------------------
    conv("d0", ("d0",))
    for i in (1, 2, 3):
        conv(f"res{i}.c1", (f"res{i}", "conv1"), bias=False)
        bn(f"res{i}.b1", (f"res{i}", "bn1"))
        conv(f"res{i}.c2", (f"res{i}", "conv2"), bias=False)
        bn(f"res{i}.b2", (f"res{i}", "bn2"))
        conv(f"d{i}", (f"d{i}",))
        conv(f"c{i + 2}", (f"c{i + 2}",))
        # torch Gate.gate: 0=BN(c+1), 1=Conv, 2=ReLU, 3=Conv(->1), 4=BN(1)
        bn(f"g{i}.gate.0", (f"gate{i}", "gate_bn1"))
        conv(f"g{i}.gate.1", (f"gate{i}", "gate_conv1"))
        conv(f"g{i}.gate.3", (f"gate{i}", "gate_conv2"))
        bn(f"g{i}.gate.4", (f"gate{i}", "gate_bn2"))
        conv(f"g{i}.conv", (f"gate{i}", "conv"), bias=False)
    conv("fuse", ("fuse",), bias=False)

    # --- edge fusion + tail -------------------------------------------------
    conv("cw", ("cw",), bias=False)
    conv("expand.0", ("expand", "Conv_0"))
    bn("expand.1", ("expand", "BatchNorm_0"))
    conv("center.0", ("center", "Conv_0"))
    bn("center.1", ("center", "BatchNorm_0"))

    # --- dual-attention decoder blocks --------------------------------------
    for n in (5, 4, 3, 2):
        d = f"dec{n}"
        convT(f"{d}.up.0", (d, "mrf_up", "ConvTranspose_0"))
        bn(f"{d}.up.1", (d, "mrf_up", "BatchNorm_0"))
        conv(f"{d}.fuse.0", (d, "c3x3"))
        bn(f"{d}.fuse.1", (d, "BatchNorm_0"))
        conv(f"{d}.se.fc1", (d, "channelAttn", "fc1"))
        conv(f"{d}.se.fc2", (d, "channelAttn", "fc2"))
        conv(f"{d}.sp.down", (d, "spatialAttn", "down"), bias=False)
        bn(f"{d}.sp.bn", (d, "spatialAttn", "BatchNorm_0"))
        conv(f"{d}.sp.phi", (d, "spatialAttn", "phi"))

    # dec1: Sequential(cbr(64, 48), ConvTranspose2d(48, nf), BN, ReLU)
    conv("dec1.0.0", ("dec1", "conv", "Conv_0"))
    bn("dec1.0.1", ("dec1", "conv", "BatchNorm_0"))
    convT("dec1.1", ("dec1", "up", "ConvTranspose_0"))
    bn("dec1.2", ("dec1", "up", "BatchNorm_0"))
    conv("dec0.0", ("dec0", "Conv_0"))
    bn("dec0.1", ("dec0", "BatchNorm_0"))
    conv("final", ("final",))

    return {"params": params, "batch_stats": stats}
