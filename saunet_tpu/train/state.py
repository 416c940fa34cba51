"""Train state and SPMD train/eval steps.

This is the TPU-native replacement for the reference's SegmentationModule +
epoch driver hot loop (/root/reference/models/models.py:80-109,
/root/reference/train.py:67-150): one jit-compiled
`train_step(state, batch) -> (state, metrics)` containing forward, dual-task
loss, in-graph metrics, backward, and the optimizer update. Under a
('data','space') mesh the same program is data-parallel: batch arrays are
sharded, parameters replicated, and XLA inserts the gradient/batch-norm
reductions over ICI (no DataParallel object, no replica callbacks, no
streams).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .losses import DEFAULT_CLASS_WEIGHTS, dual_loss, dual_loss_packed
from .metrics import pixel_acc


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def replace_(self, **kw):
        return self.replace(**kw)


def create_train_state(model, tx: optax.GradientTransformation, rng,
                       input_shape=(1, 256, 256, 3),
                       init_on_cpu: bool = False) -> TrainState:
    """Initialise params/batch-stats/optimizer.

    `init_on_cpu` runs the (one-shot) init program on the host CPU backend —
    useful when accelerator compiles are expensive (remote-compile tunnels);
    parameters are identical since init is deterministic in the PRNG key.
    """
    def _init(m):
        return m.init(rng, jnp.zeros(input_shape, jnp.float32),
                      train=False)

    if init_on_cpu:
        try:
            cpu = jax.devices("cpu")[0]
            # Pallas kernels don't lower on the CPU backend; the edge
            # operator holds no parameters, so init with the XLA variant.
            init_model = (model.clone(edge_kernel="xla")
                          if hasattr(model, "edge_kernel") else model)
            with jax.default_device(cpu):
                variables = _init(init_model)
            # Round-trip through host numpy: device_put of a CPU *jax* array
            # carries its layout to the accelerator, making every jit that
            # consumes the params specialise on non-native layouts (observed:
            # 10-20x slower executables). Host numpy -> default TPU layouts.
            import numpy as _np
            variables = jax.tree.map(
                lambda x: jax.device_put(_np.asarray(x)), variables)
        except RuntimeError:
            variables = _init(model)
    else:
        variables = _init(model)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    num_class: int = 4,
                    class_weights=DEFAULT_CLASS_WEIGHTS,
                    augment_fn: Optional[Callable] = None,
                    donate: bool = True,
                    fix_bn: bool = False):
    """Build the jitted train step.

    If `augment_fn(rng, batch) -> batch` is given, on-device augmentation is
    fused into the same compiled program as the forward/backward pass — the
    TPU-first replacement for the reference's host-side PIL/scipy
    augmentation workers.

    `fix_bn` freezes batch normalisation for fine-tuning (the reference's
    --fix_bn flag, /root/reference/train.py): the forward normalises with
    the stored running statistics and `batch_stats` are left untouched,
    while all parameters (including BN affine) still receive gradients.
    """

    # Packed stream models emit lane-packed (seg, edge) via train_outputs
    # and the loss/metrics consume them packed — the 32x-lane-padded
    # (N, H, W, C) logits tensor never exists in the train program.
    packed = getattr(model, "stream_impl", "xla") == "packed"

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        apply_kw = {"method": "train_outputs"} if packed else {}
        if fix_bn:
            seg, edge = model.apply(variables, batch["image"], False,
                                    **apply_kw)
            mut_stats = batch_stats
        else:
            (seg, edge), mut = model.apply(
                variables, batch["image"], True,
                mutable=["batch_stats"], **apply_kw)
            mut_stats = mut["batch_stats"]
        if packed:
            total, parts = dual_loss_packed(
                seg, edge, batch["label"], batch["edge"],
                num_classes=num_class, class_weights=class_weights)
        else:
            total, parts = dual_loss(seg, edge, batch["label"],
                                     batch["edge"], class_weights)
        return total, (mut_stats, seg, parts)

    def step_fn(state: TrainState, batch: dict, rng):
        if augment_fn is not None:
            batch = augment_fn(rng, batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, seg, parts)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        if packed:
            from ..ops.packed import packed_argmax
            preds = packed_argmax(seg, num_class)
        else:
            preds = jnp.argmax(seg, axis=-1)
        acc, jaccard = pixel_acc(preds, batch["label"], num_class)
        metrics = dict(parts)
        metrics["acc"] = acc
        metrics["jaccard"] = jaccard

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        # Output layout matters: returning (new_state, metrics-dict) makes
        # XLA's fusion heuristics pick a measurably worse schedule for the
        # SAME math — 299.8 ms vs 284.5 at b64/224² packed (bisected in
        # tools/exp_output_layout.py; decomposition in
        # tools/profile_opt_metrics.py). Emit metrics first and the
        # state last; the public (state, metrics) API is repackaged
        # outside jit at zero cost.
        keys = tuple(sorted(metrics))
        if metric_keys:
            # A retrace (new shapes/dtypes) must emit the same metric set,
            # or the wrapper's zip would silently mislabel the scalars.
            assert tuple(metric_keys) == keys, (metric_keys, keys)
        else:
            metric_keys.extend(keys)  # trace-time capture for the wrapper
        return tuple(metrics[k] for k in keys) + (new_state,)

    metric_keys: list = []
    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(step_fn, donate_argnums=donate_argnums)

    def step(state: TrainState, batch: dict, rng=None
             ) -> Tuple[TrainState, dict]:
        out = jitted(state, batch, rng)
        return out[-1], dict(zip(metric_keys, out[:-1]))

    step._jitted = jitted  # cost-analysis/lowering access for the tools
    return step


def _use_fused_encoder(model, fused_encoder, mesh=None) -> bool:
    """Fused-encoder dispatch: Pallas dense-block kernels at eval time.

    'auto' enables it on TPU for bf16 SAUNet-style models (the kernel keeps
    bf16 feature maps VMEM-resident; f32 doubles the working set and is the
    CPU/test configuration anyway). Multi-device: pallas_call is not
    partitionable by jit auto-sharding, so a mesh must be passed — the
    kernels then run per-shard under a shard_map wrapper (batch over
    'data'; a space>1 mesh falls back to XLA, the kernel owns whole
    images)."""
    if fused_encoder is True:
        return True
    if mesh is not None and dict(mesh.shape).get("space", 1) > 1:
        return False
    return (
        fused_encoder == "auto"
        and jax.default_backend() not in ("cpu", "gpu")
        and (len(jax.devices()) == 1 or mesh is not None)
        and getattr(model, "dtype", None) == jnp.bfloat16
        and hasattr(model, "decode")
    )


def _fused_forward(model, state, images, return_att: bool = False,
                   interpret: bool = False):
    """Eval forward = fused Pallas encoder + standalone decoder apply.

    The shape stream deliberately stays XLA: a fused Pallas version
    (ops/pallas/shape_stream.py) measures 87ms vs XLA's 35.9ms at
    b64/224² — its 8-64 channel matmuls pad the MXU contraction dim to
    128, and that waste dominates anything saved on HBM lane padding.
    Kept (tested, off by default) as a documented negative result."""
    from ..models.fused_encoder import encoder_apply_fused

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, f2, f3, f4, f5 = encoder_apply_fused(
        state.params["encoder"], state.batch_stats["encoder"], images,
        dtype=model.dtype, interpret=interpret)
    return model.apply(variables, (f2, f3, f4, f5), images, False,
                       return_att, method="decode")


def _fused_forward_sharded(model, state, images, mesh, axis: str = "data",
                           interpret: bool = False):
    """Fused eval forward on a multi-device mesh: batch sharded over
    `axis`, params/stats replicated, the Pallas kernels running per-shard
    inside shard_map (eval has no cross-batch math — BN uses running
    stats — so shards are independent and no collectives are needed)."""
    from collections import namedtuple

    from jax.sharding import PartitionSpec as P

    View = namedtuple("View", ["params", "batch_stats"])

    def fwd(params, stats, imgs):
        return _fused_forward(model, View(params, stats), imgs,
                              interpret=interpret)

    return jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(state.params, state.batch_stats, images)


def _fused_forward_packed(model, state, images, interpret: bool = False):
    """Fused Pallas encoder -> lane-packed decode: (seg_p, edge_p).

    The best-of-both eval forward for packed models (VERDICT r4 task #1,
    measured in tools/profile_infer_seg.py / KERNELS.md §10): the fused
    encoder saves ~18 ms over the XLA eval encoder while the packed tail
    keeps the dense 128-lane-padded logits out of HBM — eval step 87.3 ->
    70.7 ms at b64 @224² (+23%). For INFERENCE the same composition
    measures 70.3 vs the shipping dense-unpack tail's 68.9 ms — XLA
    already fuses the unpack+argmax, so infer keeps the dense tail."""
    from ..models.fused_encoder import encoder_apply_fused

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, f2, f3, f4, f5 = encoder_apply_fused(
        state.params["encoder"], state.batch_stats["encoder"], images,
        dtype=model.dtype, interpret=interpret)
    seg_p, edge_p, _, _ = model.apply(variables, (f2, f3, f4, f5), images,
                                      False, method="_decode_packed")
    return seg_p, edge_p


def _fused_forward_packed_sharded(model, state, images, mesh,
                                  axis: str = "data",
                                  interpret: bool = False):
    """_fused_forward_packed per-shard over the `axis` mesh dimension
    (same contract as _fused_forward_sharded: eval has no cross-batch
    math, so shards are independent)."""
    from collections import namedtuple

    from jax.sharding import PartitionSpec as P

    View = namedtuple("View", ["params", "batch_stats"])

    def fwd(params, stats, imgs):
        return _fused_forward_packed(model, View(params, stats), imgs,
                                     interpret=interpret)

    return jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(state.params, state.batch_stats, images)


def make_eval_step(model, num_class: int = 4,
                   class_weights=DEFAULT_CLASS_WEIGHTS,
                   fused_encoder="auto", mesh=None,
                   interpret: bool = False,
                   with_probs: bool = False):
    """Jitted eval step: (probs, preds, metrics) with loss + in-graph IoU
    ingredients.

    Replaces the reference's per-sample python eval loop
    (/root/reference/train.py:25-64) — slices are batched and metrics are
    computed on-device. Pass `mesh` to run the fused Pallas encoder
    per-shard on a multi-device 'data' mesh (loss/metrics stay on global
    arrays under jit auto-sharding).

    For `stream_impl='packed'` models the whole eval program stays in the
    lane-packed layout (train_outputs + dual_loss_packed + packed_argmax):
    the (N, H, W, C) logits — which HBM pads to 128 lanes, 32x their
    nominal size at C=4 — never exist, mirroring the train step.

    `with_probs=False` (default) returns None in the probs slot: the dense
    softmax output alone is a 128-lane-padded full-res tensor (~1.6 GB of
    HBM writes at 224² b64) and no driver consumes it. Set True for the
    reference's test-branch softmax contract
    (/root/reference/models/models.py:96-102).
    """
    packed_model = getattr(model, "stream_impl", "xla") == "packed"

    def _dispatch(images):
        """Static per-trace dispatch (jit retraces per input shape).

        Measured (v5e): for packed models the winning eval program is the
        fused Pallas encoder feeding the PACKED decode + packed loss —
        87.3 -> 70.7 ms at b64 @224² vs the fully-packed XLA program
        (r5, tools/profile_infer_seg.py; KERNELS.md §10). The r4
        fused-encoder eval was slower (497.2 vs 725.6 slices/sec) only
        because it paid ~59 ms of lane-padded dense dual-loss logits;
        the packed tail removes that. The fused encoder's banded
        fallback still collapses beyond ~256² (infer: 54.1 vs 134.0
        slices/sec at 512²), so auto gates it at 256."""
        if fused_encoder == "auto":
            fused = (_use_fused_encoder(model, "auto", mesh)
                     and max(images.shape[1], images.shape[2]) <= 256)
        else:
            fused = _use_fused_encoder(model, fused_encoder, mesh)
        return fused, packed_model

    def step_fn(state: TrainState, batch: dict):
        fused, packed = _dispatch(batch["image"])
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        # optional (N,) validity mask: the driver pads the last val batch by
        # repeating a slice; masked reductions keep the reported loss equal
        # to the loss over the real samples only
        mask = batch.get("valid")
        probs = None
        if packed:
            from ..ops.packed import packed_argmax, unpack
            if fused and mesh is not None:
                seg_p, edge_p = _fused_forward_packed_sharded(
                    model, state, batch["image"], mesh,
                    interpret=interpret)
            elif fused:
                seg_p, edge_p = _fused_forward_packed(
                    model, state, batch["image"], interpret=interpret)
            else:
                seg_p, edge_p = model.apply(variables, batch["image"],
                                            False, method="train_outputs")
            total, parts = dual_loss_packed(
                seg_p, edge_p, batch["label"], batch["edge"],
                num_classes=num_class, class_weights=class_weights,
                sample_mask=mask)
            preds = packed_argmax(seg_p, num_class)
            if with_probs:  # unpack once, at the very end
                probs = jax.nn.softmax(
                    unpack(seg_p, num_class).astype(jnp.float32), axis=-1)
        else:
            if fused and mesh is not None:
                seg, edge = _fused_forward_sharded(model, state,
                                                   batch["image"], mesh,
                                                   interpret=interpret)
            elif fused:
                seg, edge = _fused_forward(model, state, batch["image"],
                                           interpret=interpret)
            else:
                seg, edge = model.apply(variables, batch["image"],
                                        train=False)
            total, parts = dual_loss(seg, edge, batch["label"],
                                     batch["edge"], class_weights,
                                     sample_mask=mask)
            preds = jnp.argmax(seg, axis=-1)
            if with_probs:
                probs = jax.nn.softmax(seg, axis=-1)
        acc, jaccard = pixel_acc(preds, batch["label"], num_class)
        metrics = dict(parts)
        metrics["acc"] = acc
        metrics["jaccard"] = jaccard
        return probs, preds, metrics

    return jax.jit(step_fn)


def make_infer_step(model, fused_encoder="auto", mesh=None,
                    interpret: bool = False,
                    with_probs: bool = False, with_edge: bool = False,
                    with_att: bool = False):
    """Jitted inference: (probs, preds, edge) from images only — the
    test_and_pack forward path, batched over z-slices. Pass `mesh` to run
    the fused Pallas encoder per-shard over the 'data' axis.

    Packed-stream models run entirely in the lane-packed layout (see
    make_eval_step). `with_probs`/`with_edge` default False — each gated
    output is a 128-lane-padded full-res tensor that no driver consumes
    (test_and_pack exports argmax predictions only,
    /root/reference/test_and_pack.py:122-124); None is returned in its
    slot.

    `with_att=True` returns a FOURTH element: the decoder attention +
    shape-stream gate maps (`SAUNet.decode(return_att=True)` — the
    reference's `model(..., attention_map=True)` surface,
    /root/reference/models/models.py:96-102, which its own test driver
    fetches and drops). The attention path needs the XLA shape stream's
    gate maps, so the fused Pallas encoder composes with it (the stream is
    XLA either way) but the mesh-sharded fused wrapper does not — with a
    mesh the forward falls back to jit auto-sharding."""
    packed_model = getattr(model, "stream_impl", "xla") == "packed"
    num_class = getattr(model, "num_classes", 4)

    def _dispatch(images):
        """Static per-trace dispatch (jit retraces per input shape).

        Measured (v5e, r4): the fused Pallas encoder wins inference at
        224² (921.1 vs 726.2 slices/sec over the pure packed program)
        but its banded halo'd fallback collapses at 512² (54.1 vs
        134.0, 14% vs 70% HBM util) — auto gates it at <= 256².
        The fused path keeps the DENSE unpack+argmax tail: swapping in
        the packed decode + packed_argmax measures 70.3 vs 68.9 ms
        (r5, tools/profile_infer_seg.py) — XLA fuses the unpack into
        the argmax, so the dense tail is already free and the eval
        step's packed-tail win does not transfer here."""
        if fused_encoder == "auto":
            fused = (_use_fused_encoder(model, "auto", mesh)
                     and max(images.shape[1], images.shape[2]) <= 256)
        else:
            fused = _use_fused_encoder(model, fused_encoder, mesh)
        return fused, (not fused and packed_model)

    def step_fn(state: TrainState, images):
        fused, packed = _dispatch(images)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        probs = edge = None
        if with_att:
            if fused and mesh is None:
                seg, edge_full, atts = _fused_forward(
                    model, state, images, return_att=True,
                    interpret=interpret)
            else:
                seg, edge_full, atts = model.apply(
                    variables, images, train=False, return_att=True)
            preds = jnp.argmax(seg, axis=-1)
            if with_probs:
                probs = jax.nn.softmax(seg, axis=-1)
            if with_edge:
                edge = edge_full
            return probs, preds, edge, atts
        if packed:
            from ..ops.packed import packed_argmax, unpack
            seg_p, edge_p = model.apply(variables, images, False,
                                        method="train_outputs")
            preds = packed_argmax(seg_p, num_class)
            if with_probs:
                probs = jax.nn.softmax(
                    unpack(seg_p, num_class).astype(jnp.float32), axis=-1)
            if with_edge:
                edge = unpack(edge_p, 1)
        else:
            if fused and mesh is not None:
                seg, edge_full = _fused_forward_sharded(
                    model, state, images, mesh, interpret=interpret)
            elif fused:
                seg, edge_full = _fused_forward(model, state, images,
                                                interpret=interpret)
            else:
                seg, edge_full = model.apply(variables, images, train=False)
            preds = jnp.argmax(seg, axis=-1)
            if with_probs:
                probs = jax.nn.softmax(seg, axis=-1)
            if with_edge:
                edge = edge_full
        return probs, preds, edge

    return jax.jit(step_fn)
