"""Edge-kernel dispatch rules: XLA on CPU; on TPU the fused whole-image
Pallas kernel when its VMEM working set fits (~18 live (H,W) f32 buffers,
<= ~448²) and the row-tiled Pallas kernel above that."""
import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet
from saunet_tpu.ops.pallas.canny import pick_tile_rows


def _pallas_enabled(model):
    return model.edge_kernel == "pallas" or (
        model.edge_kernel == "auto"
        and jax.default_backend() not in ("cpu", "gpu"))


def test_auto_uses_xla_on_cpu():
    m = SAUNet()
    assert jax.default_backend() == "cpu"
    assert _pallas_enabled(m) is False


def test_forced_pallas_overrides():
    m = SAUNet(edge_kernel="pallas")
    assert _pallas_enabled(m) is True


def test_vmem_threshold():
    # whole-image kernel keeps 448² in, 512² goes to the tiled kernel
    assert 448 * 448 <= 220_000
    assert 512 * 512 > 220_000


def test_pick_tile_rows():
    # 512²: a divisor of 512 whose halo'd f32 band fits the VMEM budget
    tr = pick_tile_rows(512, 512)
    assert tr is not None and 512 % tr == 0 and tr % 8 == 0
    assert (tr + 24) * 512 * 4 * 20 <= 12 * 1024 * 1024
    # 1024²: still tileable (bands get shorter)
    assert pick_tile_rows(1024, 1024) is not None
    # absurd width: nothing fits
    assert pick_tile_rows(64, 10_000_000) is None


def test_model_forward_works_with_xla_kernel():
    m = SAUNet(num_classes=4, edge_kernel="xla")
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    seg, edge = m.apply(v, x, train=False)
    assert seg.shape == (1, 32, 32, 4)
