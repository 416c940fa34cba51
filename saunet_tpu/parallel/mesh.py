"""Device mesh construction and sharding rules.

This module IS the distributed backend — the TPU-native replacement for the
reference's entire parallel stack (SURVEY.md §2.3):
  * UserScatteredDataParallel scatter/gather threads + CUDA streams
    (/root/reference/lib/nn/parallel/data_parallel.py) -> batch arrays laid
    out over a named mesh axis; XLA moves the data.
  * SynchronizedBatchNorm master/slave rendezvous
    (/root/reference/lib/nn/modules/{comm,batchnorm}.py) -> nothing: under
    SPMD jit the batch-norm reduction is a *global* computation and the
    compiler inserts the cross-device psum over ICI.
  * The unused DistributedSampler (/root/reference/lib/utils/data/
    distributed.py) -> per-host shard indexing in the input pipeline.

Mesh layout: ('data', 'space'). 'data' shards the batch (DP). 'space'
optionally shards the image H axis — the conv-net analogue of
sequence/context parallelism for large (512²+) inputs; XLA's spatial
partitioner inserts halo exchanges for the convolution edges automatically.
Default is pure DP ('space' size 1).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


#: Minimum image/feature rows each 'space' shard must own. With exactly one
#: row per shard, XLA's (GSPMD) partitioner miscompiles the BACKWARD of the
#: DenseNet fan-out pattern `concat([x, conv3x3(x)])` — gradients come back
#: wrong by orders of magnitude and the error compounds per dense layer,
#: while the forward (loss) stays correct. Reproduced on jax 0.8 CPU with 8
#: virtual devices (tests/test_spatial_partition.py documents the envelope);
#: plain conv/pool/transpose chains at one row per shard are exact. Two rows
#: per shard is exact for every pattern in this model.
MIN_SPATIAL_SHARD_ROWS = 2

#: Stride of the deepest DENSE feature map relative to the input: SAUNet's
#: denseblock4/f5 run at H/16 (conv0 /2, three transitions /2 each). The
#: stride-32 center block below it contains only plain conv/pool/transpose
#: ops, which are exact down to one row per shard.
DEEPEST_DENSE_STRIDE = 16


def validate_spatial_partition(crop_size: int, space: int) -> None:
    """Reject 'space' sizes outside the verified-correct envelope: the
    deepest dense block must keep >= MIN_SPATIAL_SHARD_ROWS rows per
    shard (e.g. crop 256 -> space <= 8, crop 64 -> space <= 2)."""
    if space <= 1:
        return
    rows = crop_size // DEEPEST_DENSE_STRIDE // space
    if rows < MIN_SPATIAL_SHARD_ROWS:
        raise ValueError(
            f"space={space} leaves {rows} row(s) of the deepest dense "
            f"block (H={crop_size // DEEPEST_DENSE_STRIDE}) per shard; "
            f"the XLA spatial partitioner miscompiles the dense-concat "
            f"backward below {MIN_SPATIAL_SHARD_ROWS} rows/shard. Use "
            f"space <= {crop_size // DEEPEST_DENSE_STRIDE // 2} at crop "
            f"{crop_size}.")


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None, space: int = 1) -> Mesh:
    """Build a ('data', 'space') mesh over `devices` (default: all)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % space == 0, f"{n} devices not divisible by space={space}"
        data = n // space
    assert data * space == n, (
        f"mesh {data}x{space} != {n} devices")
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None
                   ) -> NamedSharding:
    """Sharding for NHWC batches: batch over 'data', optionally H over
    'space'."""
    spec = [None, None, None, None]
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["space"] > 1:
        spec[spatial_axis] = "space"
    elif mesh.shape["space"] > 1:
        spec[1] = "space"
    return NamedSharding(mesh, P(*spec))


def label_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, H, W) label batches."""
    spec = ["data", None, None]
    if mesh.shape["space"] > 1:
        spec[1] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh: arrays with a leading batch dim
    are sharded over 'data' (and H over 'space'), everything else
    replicated."""
    def place(x):
        x = np.asarray(x)
        if x.ndim == 4:
            return jax.device_put(x, batch_sharding(mesh))
        if x.ndim == 3:
            return jax.device_put(x, label_sharding(mesh))
        return jax.device_put(x, replicated_sharding(mesh))
    return jax.tree.map(place, batch)
