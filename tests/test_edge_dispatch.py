"""Edge-kernel dispatch rules: XLA on CPU, Pallas on TPU only when the
fused kernel's VMEM working set fits (~18 live (H,W) f32 buffers)."""
import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet


def _would_use_pallas(model, h, w):
    fits = h * w <= 220_000
    return model.edge_kernel == "pallas" or (
        model.edge_kernel == "auto" and fits
        and jax.default_backend() not in ("cpu", "gpu"))


def test_auto_uses_xla_on_cpu():
    m = SAUNet()
    assert jax.default_backend() == "cpu"
    assert _would_use_pallas(m, 224, 224) is False


def test_forced_pallas_overrides():
    m = SAUNet(edge_kernel="pallas")
    assert _would_use_pallas(m, 512, 512) is True


def test_vmem_threshold():
    # the dispatch constant must keep 448² in and 512² out
    assert 448 * 448 <= 220_000
    assert 512 * 512 > 220_000


def test_model_forward_works_with_xla_kernel():
    m = SAUNet(num_classes=4, edge_kernel="xla")
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    seg, edge = m.apply(v, x, train=False)
    assert seg.shape == (1, 32, 32, 4)
