"""Full-model weight port: TorchSAUNet -> flax SAUNet.

Oracle: the two independent implementations must produce the same forward
outputs from ported weights — this pins every porting rule at once (conv
OIHW->HWIO, ConvTranspose flip, BN field mapping, module name map) and is
the foundation of the deterministic fidelity gate (VERDICT r2 #5).
The torch net mirrors /root/reference/models/models.py:264-394; the edge
cue mirror pins the on-device edge operator (ops/edge.py) cross-framework.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_torch_canny_mirror_matches_jax():
    """tools/torch_baseline._canny_torch == ops/edge.canny_edges on the
    same input (up to threshold-boundary fp flips, which are measure-zero
    for random inputs)."""
    from torch_baseline import _canny_torch, _gray255_torch

    from saunet_tpu.ops.edge import canny_edges, image_to_gray255

    rs = np.random.RandomState(3)
    x = rs.rand(2, 48, 48, 3).astype(np.float32)

    gray_j = image_to_gray255(jnp.asarray(x))
    gray_t = _gray255_torch(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(gray_j)[..., 0], gray_t.numpy()[:, 0], rtol=1e-5,
        atol=1e-3)

    ej = np.asarray(canny_edges(gray_j))[..., 0]
    et = _canny_torch(gray_t).numpy()[:, 0]
    agree = (ej == et).mean()
    assert agree > 0.999, f"canny mirrors agree on only {agree:.4%}"


def test_ported_forward_parity():
    """One train-mode forward from ported weights: seg/edge outputs of the
    two frameworks agree to fp tolerance."""
    from torch_baseline import TorchSAUNet

    from saunet_tpu.models import SAUNet
    from saunet_tpu.models.torch_port import port_torch_saunet_state_dict

    torch.manual_seed(0)
    tmodel = TorchSAUNet(edge_cue="canny")
    tmodel.train()
    variables = port_torch_saunet_state_dict(tmodel.state_dict())

    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        seg_t, edge_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = SAUNet(num_classes=4, edge_kernel="xla")
    (seg_j, edge_j), _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, variables["params"]),
         "batch_stats": jax.tree.map(jnp.asarray,
                                     variables["batch_stats"])},
        jnp.asarray(x), True, mutable=["batch_stats"])

    st = seg_t.numpy().transpose(0, 2, 3, 1)
    et = edge_t.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(st).max()
    assert np.abs(np.asarray(seg_j) - st).max() < 5e-3 * max(scale, 1.0)
    np.testing.assert_allclose(np.asarray(edge_j), et, atol=1e-4)


def test_port_covers_every_torch_parameter():
    """Every torch parameter/buffer lands somewhere in the flax tree and
    the flax tree has no leaf the port did not fill (guards against a
    silently-unported module after either side is refactored)."""
    from torch_baseline import TorchSAUNet

    from saunet_tpu.models import SAUNet
    from saunet_tpu.models.torch_port import port_torch_saunet_state_dict

    torch.manual_seed(0)
    tmodel = TorchSAUNet(edge_cue="canny")
    variables = port_torch_saunet_state_dict(tmodel.state_dict())

    n_torch = sum(v.numel() for k, v in tmodel.state_dict().items()
                  if "num_batches_tracked" not in k)
    n_flax = sum(int(np.prod(l.shape))
                 for l in jax.tree.leaves(variables))
    assert n_torch == n_flax, (n_torch, n_flax)

    model = SAUNet(num_classes=4, edge_kernel="xla")
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    # identical tree structure and leaf shapes as a fresh init
    ref_leaves = jax.tree_util.tree_flatten_with_path(
        {"params": init["params"], "batch_stats": init["batch_stats"]})[0]
    got_leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    ref_map = {jax.tree_util.keystr(p): l.shape for p, l in ref_leaves}
    got_map = {jax.tree_util.keystr(p): np.shape(l) for p, l in got_leaves}
    assert ref_map == got_map
