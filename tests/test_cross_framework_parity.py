"""Cross-framework numeric parity: the flax DenseNet-121 encoder vs an
independent torch implementation (tools/torch_baseline.py) with ported
weights on the same input. Agreement of two independent implementations is
the oracle for the encoder math (layer order, pool0 drop, no-relu taps) —
the hard part of SURVEY.md §7 ('Pretrained DenseNet-121 port')."""
import sys
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from torch_baseline import Encoder  # noqa: E402

from saunet_tpu.models.densenet import (  # noqa: E402
    DenseNetEncoder, port_torchvision_state_dict,
)


def torch_encoder_to_torchvision_names(enc: "Encoder") -> dict:
    """Map my torch Encoder's state_dict onto torchvision densenet121
    `features.*` names, so port_torchvision_state_dict can ingest it."""
    sd = enc.state_dict()
    out = {}
    out["features.conv0.weight"] = sd["conv0.weight"]
    for f in ("weight", "bias", "running_mean", "running_var"):
        out[f"features.norm0.{f}"] = sd[f"norm0.{f}"]
        out[f"features.norm5.{f}"] = sd[f"norm5.{f}"]
    block_sizes = {1: 6, 2: 12, 3: 24, 4: 16}
    # DenseLayer.net: 0=BN,1=ReLU,2=conv1,3=BN,4=ReLU,5=conv2
    for b, n in block_sizes.items():
        for l in range(n):
            src = f"db{b}.{l}.net"
            dst = f"features.denseblock{b}.denselayer{l + 1}"
            for f in ("weight", "bias", "running_mean", "running_var"):
                out[f"{dst}.norm1.{f}"] = sd[f"{src}.0.{f}"]
                out[f"{dst}.norm2.{f}"] = sd[f"{src}.3.{f}"]
            out[f"{dst}.conv1.weight"] = sd[f"{src}.2.weight"]
            out[f"{dst}.conv2.weight"] = sd[f"{src}.5.weight"]
    # transition: 0=BN,1=ReLU,2=conv,3=pool
    for t in (1, 2, 3):
        src = f"t{t}"
        dst = f"features.transition{t}"
        for f in ("weight", "bias", "running_mean", "running_var"):
            out[f"{dst}.norm.{f}"] = sd[f"{src}.0.{f}"]
        out[f"{dst}.conv.weight"] = sd[f"{src}.2.weight"]
    return {k: v.detach().numpy() for k, v in out.items()}


def test_densenet_encoder_matches_torch():
    torch.manual_seed(7)
    enc_t = Encoder()
    enc_t.eval()
    # randomise BN running stats so the test exercises them
    with torch.no_grad():
        for m in enc_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)

    sd = torch_encoder_to_torchvision_names(enc_t)
    variables = port_torchvision_state_dict(sd)

    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        t1, t2, t3, t4, t5 = enc_t(torch.from_numpy(x))

    enc_j = DenseNetEncoder()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    f1, f2, f3, f4, f5 = enc_j.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, xj, train=False)

    for name, tt, ff in [("f1", t1, f1), ("f2", t2, f2), ("f3", t3, f3),
                         ("f4", t4, f4), ("f5", t5, f5)]:
        ref = tt.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ff), ref, rtol=1e-3,
                                   atol=1e-4, err_msg=name)
