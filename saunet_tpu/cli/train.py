"""Training driver: `python -m saunet_tpu.cli.train <flags>`.

CLI surface mirrors the reference's train driver
(/root/reference/train.py:342-391): --id, --unet_arch, --weights_unet,
--data-root, --batch_size_per_gpu (alias --batch_size_per_device),
--num_epoch, --start_epoch, --lr_encoder, --optimizer, --seed, --ckpt,
--k_split, --num_class, --fix_bn. Derived model id composition
(train.py:410-424) and the epoch loop with per-epoch eval, cosine LR, and
best-IoU checkpointing (train.py:291-328) are preserved.

TPU-first differences: one jit-compiled SPMD train step over the device mesh
(data-parallel batch sharding; no worker processes, no scatter/gather), all
augmentation on-device, eval batched over slices instead of per-sample.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import ACDCDataset, edge_ground_truth, make_augment_fn, normalize_for_eval
from ..data.loader import ArrayDataLoader, RandomSampler
from ..models import build_unet
from ..parallel import make_mesh, shard_batch, validate_spatial_partition
from ..train import (
    BestIoUPolicy,
    cosine_epoch_schedule,
    create_optimizer,
    create_train_state,
    intersection_and_union,
    make_eval_step,
    make_train_step,
    restore_params_only,
    save_checkpoint,
)
from ..utils import AverageMeter


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SAUNet-TPU training")
    # model
    p.add_argument("--id", default="baseline",
                   help="name identifying the model")
    p.add_argument("--unet_arch", default="saunet")
    p.add_argument("--weights_unet", default="",
                   help="checkpoint to warm-start weights from")
    p.add_argument("--pretrained", default="",
                   help="torchvision densenet121 state_dict (.npz from "
                        "tools/convert_torchvision.py, or torch .pth) to "
                        "load into the encoder — the reference's ImageNet "
                        "warm start")
    # paths
    p.add_argument("--data-root", dest="data_root", type=str,
                   default=os.getenv("DATA_ROOT", ""))
    p.add_argument("--series-file", dest="series_file", type=str, default="")
    p.add_argument("--ckpt", default="./ckpt")
    # optimization
    p.add_argument("--batch_size_per_device", "--batch_size_per_gpu",
                   dest="batch_size_per_device", default=10, type=int)
    p.add_argument("--num_epoch", default=120, type=int)
    p.add_argument("--start_epoch", default=1, type=int)
    p.add_argument("--optimizer", default="radam",
                   choices=["sgd", "adam", "radam"])
    p.add_argument("--lr_encoder", default=1e-4, type=float)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--fix_bn", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    # data
    p.add_argument("--num_class", default=4, type=int)
    p.add_argument("--k_split", default=1, type=int)
    p.add_argument("--crop_size", default=256, type=int)
    p.add_argument("--stream_impl", default="auto",
                   choices=["auto", "xla", "packed"],
                   help="shape-stream layout: 'packed' cuts the "
                        "narrow-channel full-res HBM traffic; 'auto' "
                        "picks packed whenever the crop width packs well")
    p.add_argument("--encoder_concat", default="auto",
                   choices=["auto", "chain", "buffer", "fused"],
                   help="dense-block concat storage: 'auto' currently "
                        "selects 'chain' (XLA's concat fusion is near the "
                        "HBM roofline; fused measured 2.6x slower fwd+bwd, "
                        "see docs/KERNELS.md §6); 'fused' (residual-lean "
                        "custom-VJP block, ops/dense_block_train.py) and "
                        "'buffer' remain available as overrides")
    p.add_argument("--no_deform", action="store_true",
                   help="disable elastic deformation")
    p.add_argument("--slice_cache", default="",
                   help="dir to memoise host-side volume preprocessing")
    # misc
    p.add_argument("--seed", default=304, type=int)
    p.add_argument("--space", default=1, type=int,
                   help="spatial-parallel mesh axis size")
    p.add_argument("--resume", action="store_true",
                   help="resume exactly (params+optimizer+step) from the "
                        "latest checkpoint in the run's ckpt dir")
    args = p.parse_args(argv)

    n_dev = jax.device_count()
    args.batch_size = args.batch_size_per_device * max(n_dev // args.space, 1)
    args.id += f"-{args.unet_arch}-ndev{n_dev}-batchSize{args.batch_size}"
    args.id += f"-LR_unet{args.lr_encoder}-epoch{args.num_epoch}"
    args.ckpt = os.path.join(args.ckpt, args.id)
    return args


def _latest_checkpoint(ckpt_dir):
    """(path, epoch) of the newest state_epoch_N.msgpack, or None."""
    import re
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for f in os.listdir(ckpt_dir):
        m = re.match(r"state_epoch_(\d+)\.msgpack$", f)
        if m:
            e = int(m.group(1))
            if best is None or e > best[1]:
                best = (os.path.join(ckpt_dir, f), e)
    return best


def batches(n, batch_size, rng=None, drop_last=True):
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        yield idx[i:i + batch_size]


def evaluate(eval_step, prep, state, mesh, images, labels, batch_size,
             num_class):
    """Batched val pass; accumulates histogram IoU like the reference
    (/root/reference/train.py:25-64) but over slice batches on-device."""
    inter = np.zeros(num_class)
    union = np.zeros(num_class)
    loss_meter = AverageMeter()
    n = len(images)
    for sel in batches(n, batch_size, drop_last=False):
        pad = batch_size - len(sel)
        sel_p = np.concatenate([sel, np.repeat(sel[-1:], pad)]) if pad else sel
        img, edge = prep(jnp.asarray(images[sel_p]),
                         jnp.asarray(labels[sel_p]))
        valid = np.ones(len(sel_p), np.float32)
        if pad:
            valid[len(sel):] = 0.0  # mask the repeated padding samples
        batch = shard_batch(
            {"image": np.asarray(img),
             "label": labels[sel_p].astype(np.int32),
             "edge": np.asarray(edge),
             "valid": valid}, mesh)
        probs, preds, metrics = eval_step(state, batch)
        preds = np.asarray(preds)[:len(sel)]
        loss_meter.update(float(metrics["loss"]), weight=len(sel))
        for j, k in enumerate(sel):
            i_, u_ = intersection_and_union(preds[j], labels[k], num_class)
            inter += i_
            union += u_
    iou = inter / (union + 1e-10)
    return iou[1:], loss_meter.average()


def main(argv=None):
    args = parse_args(argv)
    print("Input arguments:")
    for k, v in sorted(vars(args).items()):
        print(f"  {k:24} {v}")

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    validate_spatial_partition(args.crop_size, args.space)
    mesh = make_mesh(space=args.space)
    print(f"mesh: {dict(mesh.shape)}  devices: {jax.device_count()}")

    # --- data ---------------------------------------------------------
    series = args.series_file or None
    ds_train = ACDCDataset(args.data_root, split="train", series_file=series,
                           k_split=args.k_split, target_size=args.crop_size)
    ds_val = ACDCDataset(args.data_root, split="val", series_file=series,
                         k_split=args.k_split, target_size=args.crop_size)
    print(f"loading {len(ds_train)} train / {len(ds_val)} val volumes ...")
    t0 = time.time()
    cache = args.slice_cache or None
    train_imgs, train_labs, _ = ds_train.load_slices(cache_dir=cache)
    val_imgs, val_labs, _ = ds_val.load_slices(cache_dir=cache)
    print(f"  {len(train_imgs)} train / {len(val_imgs)} val slices "
          f"({time.time() - t0:.1f}s)")

    steps_per_epoch = max(len(train_imgs) // args.batch_size, 1)

    # --- model / optimizer -------------------------------------------
    stream_impl = args.stream_impl
    if stream_impl == "auto":
        from ..models.packed_stream import packed_stream_worthwhile
        stream_impl = ("packed" if packed_stream_worthwhile(args.crop_size)
                       else "xla")
    encoder_concat = args.encoder_concat
    if encoder_concat == "auto":
        # measured on v5e @224² b64 (tools/profile_concat.py): chain
        # encoder fwd+bwd 150.6 ms / 116 GB at 770 GB/s — 94% of the HBM
        # roofline — vs chunked-fused 396.9 ms / 369 GB: the custom VJP's
        # per-layer re-reads of the saved concat plus the gradient-prefix
        # accumulation are themselves O(L²·G) traffic, and XLA's native
        # concat fusion is already near bandwidth-optimal. Chain stays the
        # default; 'fused'/'buffer' remain available for other geometries.
        encoder_concat = "chain"
    model = build_unet(num_class=args.num_class, arch=args.unet_arch,
                       dtype=args.dtype, stream_impl=stream_impl,
                       encoder_concat=encoder_concat)
    schedule = cosine_epoch_schedule(args.lr_encoder, args.num_epoch,
                                     steps_per_epoch)
    tx = create_optimizer(args.optimizer, schedule, beta1=args.beta1,
                          weight_decay=args.weight_decay)
    state = create_train_state(model, tx, rng,
                               input_shape=(1, args.crop_size,
                                            args.crop_size, 3))
    if args.pretrained:
        from ..models.densenet import load_pretrained_encoder
        state = load_pretrained_encoder(args.pretrained, state)
        print(f"Loaded pretrained encoder weights from {args.pretrained}.")
    if args.weights_unet:
        state = restore_params_only(args.weights_unet, state)
        print("Loaded pretrained UNet weights.")
    if args.resume:
        latest = _latest_checkpoint(args.ckpt)
        if latest:
            from ..train import restore_checkpoint
            state = restore_checkpoint(latest[0], state)
            args.start_epoch = latest[1] + 1
            print(f"Resumed from {latest[0]} (epoch {latest[1]}); "
                  f"continuing at epoch {args.start_epoch}")

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"model: {args.unet_arch}  params: {n_params / 1e6:.2f}M")

    augment = make_augment_fn(num_classes=args.num_class,
                              enable_deform=not args.no_deform)
    train_step = make_train_step(model, tx, num_class=args.num_class,
                                 augment_fn=augment, fix_bn=args.fix_bn)
    eval_step = make_eval_step(model, num_class=args.num_class)
    prep = jax.jit(lambda im, lb: (normalize_for_eval(im),
                                   edge_ground_truth(lb, args.num_class)))

    # --- epoch loop ---------------------------------------------------
    history = {"train": {"epoch": [], "loss": [], "acc": [], "jaccard": []},
               "val": {"epoch": [], "iou": [], "loss": []}}
    policy = BestIoUPolicy()
    shuffle_rng = np.random.RandomState(args.seed)
    os.makedirs(args.ckpt, exist_ok=True)

    # multi-host: each process loads its shard of the global index space
    if jax.process_count() > 1:
        from ..data.loader import DistributedShardSampler
        sampler = DistributedShardSampler(len(train_imgs), seed=args.seed)
    else:
        sampler = RandomSampler(len(train_imgs), shuffle_rng)
    loader = ArrayDataLoader(
        {"image": train_imgs, "label": train_labs.astype(np.int32)},
        batch_size=args.batch_size, sampler=sampler,
        place=lambda b: shard_batch(b, mesh), prefetch=2)

    for epoch in range(args.start_epoch, args.num_epoch + 1):
        if hasattr(sampler, "set_epoch"):
            sampler.set_epoch(epoch)
        loss_m, acc_m = AverageMeter(), AverageMeter()
        jac_m = AverageMeter()
        time_m = AverageMeter()
        tic = time.time()
        for it, batch in enumerate(loader):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            loss_m.update(float(metrics["loss"]))
            acc_m.update(float(metrics["acc"]) * 100)
            jac_m.update(np.asarray(metrics["jaccard"]) * 100)
            time_m.update(time.time() - tic)
            tic = time.time()
            if (it + 1) % 10 == 0:
                lr_now = float(schedule(int(state.step) - 1))
                jac = np.round(jac_m.average(), 2)
                print(f"Epoch: [{epoch}/{args.num_epoch}] "
                      f"Iter: [{it + 1}/{steps_per_epoch}] "
                      f"Time: {time_m.average():.2f}s lr: {lr_now:.6f} "
                      f"Acc: {acc_m.average():.2f} "
                      f"Loss: {loss_m.average():.4f} Jaccard: {jac}")

        history["train"]["epoch"].append(epoch)
        history["train"]["loss"].append(loss_m.average())
        history["train"]["acc"].append(acc_m.average())
        history["train"]["jaccard"].append(
            float(np.mean(jac_m.average())))

        iou, val_loss = evaluate(eval_step, prep, state, mesh, val_imgs,
                                 val_labs, args.batch_size, args.num_class)
        for i, v in enumerate(iou, start=1):
            print(f"class [{i}], IoU: {v:.4f}")
        print(f"val loss: {val_loss:.4f}")
        history["val"]["epoch"].append(epoch)
        history["val"]["iou"].append([float(v) for v in iou])
        history["val"]["loss"].append(float(val_loss))

        if policy.update(epoch, iou, args.num_epoch):
            path = save_checkpoint(args.ckpt, f"epoch_{epoch}", state,
                                   history)
            print(f"Saved checkpoint {path}")

    with open(os.path.join(args.ckpt, "best.json"), "w") as f:
        json.dump({**policy.best, **policy.best_epoch}, f, indent=2)
    print("Training Done!")


if __name__ == "__main__":
    main()
