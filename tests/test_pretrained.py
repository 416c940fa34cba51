"""Pretrained-weight ingestion: torchvision densenet121 .npz ->
TrainState encoder graft (the train CLI's --pretrained path), and the
MIT-CSAIL/torchvision ResNet state-dict porting hook.

Replaces the reference's on-the-fly downloads
(/root/reference/models/models.py:271, /root/reference/models/resnet.py:220-228)
with explicit local archives — synthetic state dicts here carry the exact
torchvision names/shapes, no torch needed.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models.densenet import (
    DENSENET121_BLOCKS,
    load_pretrained_encoder,
)
from saunet_tpu.models.resnet import port_resnet_state_dict, resnet18


def synth_densenet121_state_dict(rs) -> dict:
    """Random tensors under exact torchvision densenet121 names/shapes."""
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rs.randn(c).astype(np.float32)
        sd[f"{name}.bias"] = rs.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = (rs.randn(c) * 0.3).astype(np.float32)
        sd[f"{name}.running_var"] = (0.5 + rs.rand(c)).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.int64(0)

    sd["features.conv0.weight"] = rs.randn(64, 3, 7, 7).astype(np.float32)
    bn("features.norm0", 64)
    c = 64
    for b, n_layers in enumerate(DENSENET121_BLOCKS, start=1):
        for l in range(1, n_layers + 1):
            pre = f"features.denseblock{b}.denselayer{l}"
            cl = c + (l - 1) * 32
            bn(f"{pre}.norm1", cl)
            sd[f"{pre}.conv1.weight"] = rs.randn(128, cl, 1, 1).astype(
                np.float32)
            bn(f"{pre}.norm2", 128)
            sd[f"{pre}.conv2.weight"] = rs.randn(32, 128, 3, 3).astype(
                np.float32)
        c += n_layers * 32
        if b != len(DENSENET121_BLOCKS):
            bn(f"features.transition{b}.norm", c)
            sd[f"features.transition{b}.conv.weight"] = rs.randn(
                c // 2, c, 1, 1).astype(np.float32)
            c //= 2
    bn("features.norm5", c)
    sd["classifier.weight"] = rs.randn(1000, c).astype(np.float32)
    sd["classifier.bias"] = rs.randn(1000).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def saunet_state():
    from saunet_tpu.models import SAUNet
    from saunet_tpu.train import create_train_state, radam

    model = SAUNet(num_classes=4, edge_kernel="xla")
    return create_train_state(model, radam(1e-3), jax.random.PRNGKey(0),
                              input_shape=(1, 32, 32, 3))


def test_load_pretrained_encoder_npz(tmp_path, saunet_state):
    rs = np.random.RandomState(0)
    sd = synth_densenet121_state_dict(rs)
    path = tmp_path / "densenet121.npz"
    np.savez(path, **sd)

    state = load_pretrained_encoder(str(path), saunet_state)

    # conv kernels OIHW -> HWIO, BN affine + running stats all land
    np.testing.assert_allclose(
        np.asarray(state.params["encoder"]["conv0"]["kernel"],
                   np.float32),
        sd["features.conv0.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    lp = state.params["encoder"]["denseblock3"]["denselayer7"]
    np.testing.assert_allclose(
        np.asarray(lp["conv2"]["kernel"], np.float32),
        sd["features.denseblock3.denselayer7.conv2.weight"].transpose(
            2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["encoder"]["norm5"]["var"],
                   np.float32),
        sd["features.norm5.running_var"], rtol=1e-6)
    # decoder untouched
    for k in state.params:
        if k != "encoder":
            a = jax.tree.leaves(state.params[k])
            b = jax.tree.leaves(saunet_state.params[k])
            assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_load_pretrained_encoder_shape_mismatch(tmp_path, saunet_state):
    rs = np.random.RandomState(1)
    sd = synth_densenet121_state_dict(rs)
    sd["features.conv0.weight"] = rs.randn(64, 1, 7, 7).astype(np.float32)
    path = tmp_path / "bad.npz"
    np.savez(path, **sd)
    with pytest.raises(ValueError, match="shape"):
        load_pretrained_encoder(str(path), saunet_state)


def test_train_cli_accepts_pretrained_flag():
    from saunet_tpu.cli.train import parse_args

    args = parse_args(["--pretrained", "/tmp/enc.npz"])
    assert args.pretrained == "/tmp/enc.npz"


def synth_resnet18_state_dict(rs) -> dict:
    """MIT-CSAIL deep-stem resnet18 names/shapes
    (/root/reference/models/resnet.py:103-130)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rs.randn(o, i, k, k).astype(np.float32)

    def bn(name, cc):
        sd[f"{name}.weight"] = rs.randn(cc).astype(np.float32)
        sd[f"{name}.bias"] = rs.randn(cc).astype(np.float32)
        sd[f"{name}.running_mean"] = (rs.randn(cc) * 0.3).astype(np.float32)
        sd[f"{name}.running_var"] = (0.5 + rs.rand(cc)).astype(np.float32)

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    conv("conv2", 64, 64, 3)
    bn("bn2", 64)
    conv("conv3", 128, 64, 3)
    bn("bn3", 128)
    inplanes = 128
    for stage, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"layer{stage}.{b}"
            cin = inplanes if b == 0 else planes
            conv(f"{pre}.conv1", planes, cin, 3)
            bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3)
            bn(f"{pre}.bn2", planes)
            if b == 0:  # every stage: channel jump and/or stride
                conv(f"{pre}.downsample.0", planes, cin, 1)
                bn(f"{pre}.downsample.1", planes)
        inplanes = planes
    sd["fc.weight"] = rs.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rs.randn(1000).astype(np.float32)
    return sd


def test_port_resnet_state_dict_complete():
    rs = np.random.RandomState(2)
    sd = synth_resnet18_state_dict(rs)
    ported = port_resnet_state_dict(sd)

    model = resnet18()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x, train=False)

    def paths(tree, pre=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, pre + (k,))
            else:
                out.add(pre + (k,))
        return out

    assert paths(ported["params"]) == paths(init["params"])
    assert paths(ported["batch_stats"]) == paths(init["batch_stats"])

    np.testing.assert_allclose(
        ported["params"]["stem_conv1"]["kernel"],
        sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        ported["params"]["layer2_block1"]["down_conv"]["kernel"],
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
        rtol=1e-6)
    np.testing.assert_allclose(
        ported["batch_stats"]["layer4_block2"]["bn2"]["mean"],
        sd["layer4.1.bn2.running_mean"], rtol=1e-6)

    # shapes all agree with the flax module -> the port actually loads
    merged = jax.tree.map(lambda a, b: np.asarray(b),
                          init["params"], ported["params"])
    stats = jax.tree.map(lambda a, b: np.asarray(b),
                         init["batch_stats"], ported["batch_stats"])
    taps = model.apply({"params": merged, "batch_stats": stats}, x,
                       train=False)
    assert len(taps) == 5


# ---------------------------------------------------------------------------
# Checksummed one-command ingestion (tools/ingest_pretrained.py) — the
# scripted recipe for the reference's unconditional ImageNet warm start
# (/root/reference/models/models.py:271) in a zero-egress environment.
# ---------------------------------------------------------------------------
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _save_hub_style_checkpoint(tmp_path, sd):
    """torch.save a state dict, then rename it to the torch-hub convention
    <name>-<sha256 prefix>.pth so the embedded checksum is self-consistent."""
    torch = pytest.importorskip("torch")
    from ingest_pretrained import sha256_file

    raw = tmp_path / "raw.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(raw))
    digest = sha256_file(str(raw))
    named = tmp_path / f"densenet121-{digest[:8]}.pth"
    raw.rename(named)
    return named, digest


def test_ingest_pretrained_end_to_end(tmp_path):
    from ingest_pretrained import ingest

    rs = np.random.RandomState(7)
    src, digest = _save_hub_style_checkpoint(
        tmp_path, synth_densenet121_state_dict(rs))
    out = tmp_path / "enc.npz"
    info = ingest(str(src), str(out), smoke_graft=True)
    assert info["src_sha256"] == digest
    assert info["grafted_leaves"] > 300  # full densenet121 encoder tree
    # manifest written and re-verifiable
    line = (out.parent / (out.name + ".sha256")).read_text()
    assert line.split()[0] == digest
    # archive actually feeds --pretrained
    data = dict(np.load(out))
    assert "features.conv0.weight" in data


def test_ingest_rejects_checksum_mismatch(tmp_path):
    from ingest_pretrained import ingest

    rs = np.random.RandomState(8)
    src, _ = _save_hub_style_checkpoint(
        tmp_path, synth_densenet121_state_dict(rs))
    bad = tmp_path / "densenet121-deadbeef.pth"
    src.rename(bad)
    with pytest.raises(SystemExit, match="does not match"):
        ingest(str(bad), str(tmp_path / "x.npz"))


def test_ingest_refuses_unverifiable(tmp_path):
    from ingest_pretrained import ingest

    anon = tmp_path / "weights.pth"
    anon.write_bytes(b"not a checkpoint")
    with pytest.raises(SystemExit, match="refusing unverified"):
        ingest(str(anon), str(tmp_path / "x.npz"))


@pytest.mark.skipif(
    not os.environ.get("SAUNET_PRETRAINED_PTH"),
    reason="set SAUNET_PRETRAINED_PTH=/path/to/densenet121-a639ec97.pth to "
           "exercise real ImageNet weights (no archive ships in this image)")
def test_real_weights_ingestion(tmp_path):
    """End-to-end with the actual torchvision archive when present: verify
    the published a639ec97 digest, convert, and graft onto a real state."""
    from ingest_pretrained import ingest

    info = ingest(os.environ["SAUNET_PRETRAINED_PTH"],
                  str(tmp_path / "densenet121_imagenet.npz"),
                  sha256="a639ec97", smoke_graft=True)
    assert info["grafted_leaves"] > 300
