"""Inference driver: `python -m saunet_tpu.cli.test_and_pack <flags>`.

Capability parity with /root/reference/test_and_pack.py: load a checkpoint,
run the ACDC test set, repack slice predictions into the original 3D
geometry (undo crop + nearest resample), save NIfTI volumes with identity
orientation, and optionally write side-by-side PNG visualisations.

TPU-first difference: the reference loops one z-slice per forward
(test_and_pack.py:109-124); here ALL z-slices of a volume run as one device
batch (padded to a static bucket size so XLA compiles once per bucket).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import ACDCTestDataset, nifti, normalize_for_eval, resample_to_orig
from ..models import build_unet
from ..train import create_train_state, make_infer_step, radam, restore_params_only
from ..utils import AverageMeter


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SAUNet-TPU test + pack")
    p.add_argument("--id", required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--arch_unet", default="saunet")
    p.add_argument("--num_class", default=4, type=int)
    p.add_argument("--data-root", dest="data_root", type=str,
                   default=os.getenv("DATA_ROOT", ""))
    p.add_argument("--series-file", dest="series_file", type=str, default="")
    p.add_argument("--crop_size", default=256, type=int)
    p.add_argument("--stream_impl", default="auto",
                   choices=["auto", "xla", "packed"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--visualize", action="store_true", default=True)
    p.add_argument("--no-visualize", dest="visualize", action="store_false")
    p.add_argument("--result", default="./result")
    p.add_argument("--save_test_path", default="./test_files")
    p.add_argument("--attention_map", action="store_true",
                   help="also export the decoder attention + shape-stream "
                        "gate maps per volume as PNGs under "
                        "<result>/<id>/attention/ (the reference parses "
                        "this flag and fetches the maps but never saves "
                        "them, /root/reference/test_and_pack.py:116-120)")
    p.add_argument("--z_bucket", default=4, type=int,
                   help="slice-batch bucket granularity (static shapes)")
    args = p.parse_args(argv)
    args.result = os.path.join(args.result, args.id)
    return args


def visualize_result(img2d: np.ndarray, pred2d: np.ndarray, out_path: str):
    """Side-by-side grayscale image | prediction*85 PNG
    (/root/reference/test_and_pack.py:78-90) via PIL."""
    from PIL import Image

    img = img2d.astype(np.float64)
    rng = img.max() - img.min()
    img = ((img - img.min()) / rng * 255.0 if rng > 0
           else np.zeros_like(img)).astype(np.uint8)
    pred = (pred2d * 85).astype(np.uint8)
    vis = np.concatenate([img, pred], axis=1)
    Image.fromarray(vis, mode="L").save(out_path)


def save_attention_maps(atts, vol_name: str, z: int, out_dir: str):
    """Export the decoder attention maps (att2..att5, upsampled) and the
    three shape-stream gate maps as per-slice grayscale PNGs. Exceeds the
    reference, whose --attention_map flag fetches `maps` and never writes
    them (/root/reference/test_and_pack.py:116-120)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    names = ["att2", "att3", "att4", "att5", "gate1", "gate2", "gate3"]
    for k, amap in enumerate(atts):
        name = names[k] if k < len(names) else f"att{k}"
        a = np.asarray(amap, np.float32)[:z, :, :, 0]
        lo, hi = a.min(), a.max()
        a8 = ((a - lo) / (hi - lo) * 255.0 if hi > lo
              else np.zeros_like(a)).astype(np.uint8)
        for zz in range(z):
            Image.fromarray(a8[zz], mode="L").save(
                os.path.join(out_dir, f"{vol_name}_{name}_z{zz}.png"))


def main(argv=None):
    args = parse_args(argv)
    print("Input arguments:")
    for k, v in sorted(vars(args).items()):
        print(f"  {k:20} {v}")

    stream_impl = getattr(args, "stream_impl", "auto")
    if stream_impl == "auto":
        from ..models.packed_stream import packed_stream_worthwhile
        stream_impl = ("packed" if packed_stream_worthwhile(args.crop_size)
                       else "xla")
    model = build_unet(num_class=args.num_class, arch=args.arch_unet,
                       dtype=args.dtype, stream_impl=stream_impl)
    state = create_train_state(model, radam(1e-4), jax.random.PRNGKey(0),
                               input_shape=(1, args.crop_size,
                                            args.crop_size, 3))
    state = restore_params_only(args.checkpoint, state)
    mesh = None
    if jax.device_count() > 1:
        # multi-chip: slice batches shard over 'data'; the fused Pallas
        # encoder runs per-shard (shard_map wrapper in make_infer_step).
        # z buckets must stay divisible by the data-axis size.
        from ..parallel import make_mesh
        mesh = make_mesh(space=1)
        n_dev = jax.device_count()
        args.z_bucket = ((args.z_bucket + n_dev - 1) // n_dev) * n_dev
    infer = make_infer_step(model, mesh=mesh, with_att=args.attention_map)
    prep = jax.jit(normalize_for_eval)

    ds = ACDCTestDataset(args.data_root,
                         series_file=args.series_file or None,
                         target_size=args.crop_size)
    os.makedirs(args.save_test_path, exist_ok=True)
    if args.visualize:
        os.makedirs(args.result, exist_ok=True)

    time_meter = AverageMeter()
    for i in range(len(ds)):
        vol = ds.load_volume(i)
        z = vol.image.shape[2]
        # pad z to a bucket multiple -> static shapes, few recompiles
        zb = ((z + args.z_bucket - 1) // args.z_bucket) * args.z_bucket
        imgs = np.zeros((zb,) + vol.image.shape[:2], np.float32)
        imgs[:z] = np.moveaxis(vol.image, 2, 0)

        tic = time.perf_counter()
        batch = prep(jnp.asarray(imgs))
        atts = None
        if args.attention_map:
            probs, preds, edge, atts = infer(state, batch)
        else:
            probs, preds, edge = infer(state, batch)
        preds = np.asarray(jax.block_until_ready(preds))[:z]
        time_meter.update((time.perf_counter() - tic) / z, weight=z)

        pred_volume = np.moveaxis(preds, 0, 2).astype(np.uint8)
        pv_resized = resample_to_orig(pred_volume, vol)
        out_path = os.path.join(args.save_test_path, vol.name + ".nii.gz")
        nifti.save(pv_resized.astype(np.uint8), out_path)
        print(f"Saved {vol.name}! ({z} slices, "
              f"{time_meter.average() * 1e3:.2f} ms/slice avg)")

        if args.visualize:
            orig = _orig_volume(ds, i)
            for zz in range(vol.orig_shape[2]):
                visualize_result(
                    orig[:, :, zz], pv_resized[:, :, zz],
                    os.path.join(args.result, f"{vol.name}{zz}.png"))

        if atts is not None:
            save_attention_maps(atts, vol.name, z,
                                os.path.join(args.result, "attention"))

    with open(os.path.join(args.save_test_path, "timing.json"), "w") as f:
        json.dump({"ms_per_slice": float(time_meter.average() * 1e3)}, f)
    print("Evaluation Done!")


def _orig_volume(ds: ACDCTestDataset, index: int) -> np.ndarray:
    patient, frame = ds.series[index]
    base = os.path.join(ds.test_dir, f"patient{patient:03d}",
                        f"patient{patient:03d}_frame{frame:02d}")
    path = base + ".nii.gz"
    if not os.path.exists(path):
        path = base + ".nii"
    return np.asarray(nifti.load(path).data)


if __name__ == "__main__":
    main()
