"""DenseNet-121 feature encoder, native JAX/flax (NHWC).

The reference uses torchvision's pretrained densenet121 and taps its internal
features (/root/reference/models/models.py:271,304-313), with two quirks this
module reproduces exactly:
  * `pool0` is dropped and `relu0` is skipped — stage 1 is conv0+norm0 only,
    so denseblock1 runs at H/2 (128² for 256² inputs), not H/4.
  * `conv5` taps denseblock4+norm5 *without* a trailing ReLU.

Feature taps (256² input): f1 64ch@128², f2 128ch@64², f3 256ch@32²,
f4 512ch@16², f5 1024ch@16² — the resolution table of SURVEY.md §3.3.

Pretrained weights: zero-egress environment, so `pretrained` loads from a
local numpy archive if provided (see `port_torchvision_state_dict` for the
torchvision name mapping) and falls back to Kaiming init otherwise. This is a
documented deviation from the reference's unconditional download.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import kaiming_normal_out
from .norm import batch_norm

Dtype = Any

DENSENET121_BLOCKS = (6, 12, 24, 16)
GROWTH_RATE = 32
BN_SIZE = 4
NUM_INIT_FEATURES = 64


class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1(bn_size*k) -> BN-ReLU-Conv3x3(k); returns new features
    to concatenate."""
    growth_rate: int = GROWTH_RATE
    bn_size: int = BN_SIZE
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = batch_norm(train, self.dtype, name="norm1")(x)
        h = self.act(h)
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="conv1")(h)
        h = batch_norm(train, self.dtype, name="norm2")(h)
        h = self.act(h)
        h = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="conv2")(h)
        return h


class _BNVars(nn.Module):
    """Declare a BatchNorm's parameter/stat leaves (scale/bias +
    batch_stats mean/var) with flax-identical names, shapes, inits and
    dtypes — WITHOUT computing anything. Lets the fused dense block own
    the math while staying checkpoint-compatible with `nn.BatchNorm`."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda s: jnp.zeros(s, jnp.float32),
                             (self.features,))
        var = self.variable("batch_stats", "var",
                            lambda s: jnp.ones(s, jnp.float32),
                            (self.features,))
        return scale, bias, mean, var


class _ConvVars(nn.Module):
    """Declare an `nn.Conv(use_bias=False)`-compatible kernel leaf."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal_out, self.shape,
                          jnp.float32)


class _DenseLayerVars(nn.Module):
    """Variable tree of one DenseLayer (norm1/conv1/norm2/conv2), names
    and leaves identical to the chain-mode `DenseLayer` — checkpoints and
    pretrained ports are layout-independent across concat modes."""
    c_in: int

    @nn.compact
    def __call__(self):
        hidden = BN_SIZE * GROWTH_RATE
        n1 = _BNVars(self.c_in, name="norm1")()
        w1 = _ConvVars((1, 1, self.c_in, hidden), name="conv1")()
        n2 = _BNVars(hidden, name="norm2")()
        w2 = _ConvVars((3, 3, hidden, GROWTH_RATE), name="conv2")()
        return n1, w1, n2, w2


class DenseBlock(nn.Module):
    """Dense block; `concat_mode` picks how the growing concat is stored:

    * 'chain' — the textbook concatenate-per-layer. XLA materialises a
      fresh (N,H,W,Cl+G) buffer every layer: O(L²·G) channel-pixels of
      pure copy traffic through HBM on top of the compute reads.
    * 'buffer' — preallocate the final (N,H,W,Cmax) buffer once and
      dynamic-update-slice each layer's G new channels in place; layers
      read the live prefix. Same values bit-for-bit (layer l still sees
      exactly channels [0:Cl]), but XLA aliases the update in place, so
      the per-layer full-width copy disappears.
    * 'fused' — the residual-lean custom-VJP block
      (ops/dense_block_train.py): in-place buffer + single-pass
      incremental batch statistics in the forward, and a backward whose
      only tensor residual is the final buffer (prefixes re-sliced from
      it, per-layer recompute) — the train-path analogue of the eval-side
      Pallas kernel's VMEM-resident concat (ops/pallas/dense_block.py).
      Same variable tree, same math, flax-BatchNorm-exact statistics/EMA.
    """
    num_layers: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    concat_mode: str = "chain"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.concat_mode == "buffer":
            return self._call_buffer(x, train)
        if self.concat_mode == "fused":
            return self._call_fused(x, train)
        for i in range(self.num_layers):
            new = DenseLayer(dtype=self.dtype, act=self.act,
                             name=f"denselayer{i + 1}")(x, train)
            x = jnp.concatenate([x, new], axis=-1)
        return x

    def _call_buffer(self, x, train: bool):
        n, h, w, c0 = x.shape
        cmax = c0 + self.num_layers * GROWTH_RATE
        buf = jnp.zeros((n, h, w, cmax), x.dtype)
        buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
        for i in range(self.num_layers):
            cl = c0 + i * GROWTH_RATE
            new = DenseLayer(dtype=self.dtype, act=self.act,
                             name=f"denselayer{i + 1}")(
                                 buf[..., :cl], train)
            buf = jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, cl))
        return buf

    def _call_fused(self, x, train: bool):
        from ..ops.dense_block_train import (
            dense_block_eval,
            dense_block_train,
        )
        from ..utils.config import cfg as _cfg

        x = x.astype(self.dtype)
        c0 = x.shape[-1]
        layers, emas, run_stats = [], [], []
        for i in range(self.num_layers):
            cl = c0 + i * GROWTH_RATE
            (n1s, n1b, m1, v1), w1, (n2s, n2b, m2, v2), w2 = \
                _DenseLayerVars(cl, name=f"denselayer{i + 1}")()
            layers.append(dict(n1s=n1s, n1b=n1b, w1=w1,
                               n2s=n2s, n2b=n2b, w2=w2))
            emas.append((m1, v1, m2, v2))
            run_stats.append(dict(m1=m1.value, v1=v1.value,
                                  m2=m2.value, v2=v2.value))

        eps = float(_cfg.MODEL.BN_EPS)
        if not train:
            return dense_block_eval(x, layers, run_stats, eps=eps,
                                    act=self.act)

        # flax BatchNorm skips axis_name collectives during init
        axis_name = (None if self.is_initializing()
                     else _cfg.MODEL.get("BN_AXIS_NAME", None))
        buf, (g_mu, g_var, stats2) = dense_block_train(
            x, layers, eps=eps, axis_name=axis_name, act=self.act)
        if not self.is_initializing():
            mom = _cfg.MODEL.BN_MOMENTUM
            for i, (m1, v1, m2, v2) in enumerate(emas):
                cl = c0 + i * GROWTH_RATE
                m1.value = mom * m1.value + (1 - mom) * g_mu[:cl]
                v1.value = mom * v1.value + (1 - mom) * g_var[:cl]
                mu2, var2 = stats2[i]
                m2.value = mom * m2.value + (1 - mom) * mu2
                v2.value = mom * v2.value + (1 - mom) * var2
        return buf


class Transition(nn.Module):
    """BN-ReLU-Conv1x1(out) -> AvgPool 2x2."""
    out_features: int
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = batch_norm(train, self.dtype, name="norm")(x)
        x = self.act(x)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_out, dtype=self.dtype,
                    name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetEncoder(nn.Module):
    """DenseNet-121 trunk exposing the five SAUNet feature taps.

    `remat=True` rematerialises each dense block in the backward pass
    (jax.checkpoint) — trades ~1 extra forward of FLOPs for O(depth) less
    activation memory, the standard lever for growing batch/resolution on
    HBM-bound TPUs.
    """
    block_config: Sequence[int] = DENSENET121_BLOCKS
    dtype: Dtype = jnp.float32
    act: Callable = nn.relu
    remat: bool = False
    concat_mode: str = "chain"

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        block_cls = (nn.remat(DenseBlock, static_argnums=(2,))
                     if self.remat else DenseBlock)
        # Stage 1: conv0 (7x7/2) + norm0.  NO relu0 / pool0 (SAUNet drops
        # them: /root/reference/models/models.py:304-305).
        f1 = nn.Conv(NUM_INIT_FEATURES, (7, 7), strides=(2, 2),
                     padding=((3, 3), (3, 3)), use_bias=False,
                     kernel_init=kaiming_normal_out, dtype=self.dtype,
                     name="conv0")(x)
        f1 = batch_norm(train, self.dtype, name="norm0")(f1)

        features = NUM_INIT_FEATURES
        h = f1
        taps = []
        for i, num_layers in enumerate(self.block_config):
            h = block_cls(num_layers, dtype=self.dtype, act=self.act,
                          concat_mode=self.concat_mode,
                          name=f"denseblock{i + 1}")(h, train)
            features += num_layers * GROWTH_RATE
            if i != len(self.block_config) - 1:
                features = features // 2
                h = Transition(features, dtype=self.dtype, act=self.act,
                               name=f"transition{i + 1}")(h, train)
                taps.append(h)
        # norm5 after denseblock4, no trailing ReLU
        f5 = batch_norm(train, self.dtype, name="norm5")(h)
        f2, f3, f4 = taps
        return f1, f2, f3, f4, f5


def _iter_state_dict(state_dict):
    """(name, value) pairs; torchvision<=0.3 densenet checkpoints use
    `norm.1`-style dotted indices which newer loaders re-join — normalise
    the legacy pattern `normN.M` back to `normN` etc. (no-op for modern
    names)."""
    import re
    for name, v in state_dict.items():
        name = re.sub(r"\.(norm|relu|conv)\.(\d+)\.", r".\1\2.", name)
        yield name, v


def load_state_dict_file(path: str) -> dict:
    """name -> numpy array from an .npz archive (tools/convert_torchvision)
    or a torch .pth/.pt checkpoint (loaded CPU-side)."""
    import numpy as np

    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def load_pretrained_encoder(path: str, state):
    """Graft torchvision densenet121 ImageNet weights onto a TrainState's
    encoder subtree — the reference's unconditional pretrained load
    (/root/reference/models/models.py:271), done explicitly because this
    environment has no network egress.

    `path`: .npz (see tools/convert_torchvision.py) or torch .pth.
    Returns a new state with params['encoder'] / batch_stats['encoder']
    replaced; every leaf is shape-checked against the fresh-init tree and
    cast to its dtype.
    """
    import jax
    import numpy as np

    ported = port_torchvision_state_dict(load_state_dict_file(path))

    def graft(tree, new, where):
        def one(tgt, src):
            src = np.asarray(src)
            if tuple(tgt.shape) != tuple(src.shape):
                raise ValueError(
                    f"pretrained {where} leaf shape {src.shape} != model "
                    f"{tuple(tgt.shape)}")
            return jnp.asarray(src, dtype=tgt.dtype)

        return jax.tree.map(one, tree, new)

    params = dict(state.params)
    params["encoder"] = graft(state.params["encoder"], ported["params"],
                              "params")
    stats = dict(state.batch_stats)
    stats["encoder"] = graft(state.batch_stats["encoder"],
                             ported["batch_stats"], "batch_stats")
    return state.replace(params=params, batch_stats=stats)


def port_torchvision_state_dict(state_dict) -> dict:
    """Map a torchvision densenet121 `state_dict` (name -> numpy array, OIHW
    conv kernels) onto this encoder's {'params', 'batch_stats'} pytrees.

    Accepts the `features.*` naming of torchvision
    (conv0/norm0/denseblockN.denselayerM.{norm,conv}{1,2}/transitionN/norm5).
    The classifier head is ignored — SAUNet never uses it.
    """
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_w(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW -> HWIO

    for name, v in _iter_state_dict(state_dict):
        if not name.startswith("features."):
            continue
        parts = name[len("features."):].split(".")
        v = np.asarray(v)
        if parts[0].startswith("conv"):  # conv0
            put(params, (parts[0], "kernel"), conv_w(v))
        elif parts[0].startswith("norm") and len(parts) == 2:  # norm0/norm5
            mod, field = parts
            if field == "weight":
                put(params, (mod, "scale"), v)
            elif field == "bias":
                put(params, (mod, "bias"), v)
            elif field == "running_mean":
                put(stats, (mod, "mean"), v)
            elif field == "running_var":
                put(stats, (mod, "var"), v)
        elif parts[0].startswith("denseblock"):
            block, layer, mod, field = parts
            path_prefix = (block, layer)
            if mod.startswith("conv") and field == "weight":
                put(params, path_prefix + (mod, "kernel"), conv_w(v))
            elif mod.startswith("norm"):
                if field == "weight":
                    put(params, path_prefix + (mod, "scale"), v)
                elif field == "bias":
                    put(params, path_prefix + (mod, "bias"), v)
                elif field == "running_mean":
                    put(stats, path_prefix + (mod, "mean"), v)
                elif field == "running_var":
                    put(stats, path_prefix + (mod, "var"), v)
        elif parts[0].startswith("transition"):
            block, mod, field = parts
            if mod == "conv" and field == "weight":
                put(params, (block, mod, "kernel"), conv_w(v))
            elif mod == "norm":
                if field == "weight":
                    put(params, (block, mod, "scale"), v)
                elif field == "bias":
                    put(params, (block, mod, "bias"), v)
                elif field == "running_mean":
                    put(stats, (block, mod, "mean"), v)
                elif field == "running_var":
                    put(stats, (block, mod, "var"), v)
    return {"params": params, "batch_stats": stats}
