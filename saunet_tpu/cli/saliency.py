"""Saliency driver: `python -m saunet_tpu.cli.saliency <flags>`.

Capability parity with the reference's standalone saliency scripts
(/root/reference/smoothgrad.py:47-71 main, vanilla_backprop.py,
guided_backprop.py + misc_functions image export): load a checkpoint, pick a
slice, and export vanilla / guided / SmoothGrad gradient maps (color +
grayscale + positive/negative splits) as PNGs.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data import ACDCDataset, normalize_for_eval
from ..interpret import (
    convert_to_grayscale,
    guided_gradients,
    positive_negative_saliency,
    save_gradient_image,
    smooth_grad,
    vanilla_gradients,
)
from ..models import build_unet
from ..train import create_train_state, radam, restore_params_only


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SAUNet-TPU saliency maps")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-root", dest="data_root", type=str,
                   default=os.getenv("DATA_ROOT", ""))
    p.add_argument("--volume", default=0, type=int,
                   help="train/val volume index")
    p.add_argument("--slice", dest="z", default=0, type=int)
    p.add_argument("--split", default="val")
    p.add_argument("--k_split", default=1, type=int)
    p.add_argument("--num_class", default=4, type=int)
    p.add_argument("--crop_size", default=256, type=int)
    p.add_argument("--method", default="smoothgrad",
                   choices=["vanilla", "guided", "smoothgrad",
                            "smoothgrad-guided"])
    p.add_argument("--classes", default="0,1",
                   help="comma-separated class seeds (reference uses 0,1)")
    p.add_argument("--param_n", default=50, type=int)
    p.add_argument("--sigma_multiplier", default=4.0, type=float)
    p.add_argument("--out", default="./saliency")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    classes = tuple(int(c) for c in args.classes.split(","))

    model = build_unet(num_class=args.num_class)
    state = create_train_state(model, radam(1e-4), jax.random.PRNGKey(0),
                               input_shape=(1, args.crop_size,
                                            args.crop_size, 3))
    state = restore_params_only(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ds = ACDCDataset(args.data_root, split=args.split, k_split=args.k_split,
                     target_size=args.crop_size)
    vol = ds.load_volume(args.volume)
    raw = jnp.asarray(vol.image[None, :, :, args.z])
    image = normalize_for_eval(raw)[0]  # (H, W, 3)
    target = jnp.asarray(vol.label[:, :, args.z].astype(np.int32))

    if args.method == "vanilla":
        grads = vanilla_gradients(model, variables, image, target, classes)
    elif args.method == "guided":
        grads = guided_gradients(model, variables, image, target, classes)
    else:
        base = (guided_gradients if args.method.endswith("guided")
                else vanilla_gradients)
        grad_fn = lambda img: base(model, variables, img, target, classes)
        grads = smooth_grad(grad_fn, jax.random.PRNGKey(0), image,
                            n=args.param_n,
                            sigma_multiplier=args.sigma_multiplier)

    os.makedirs(args.out, exist_ok=True)
    tag = f"{vol.name}_z{args.z}_{args.method}"
    g = np.asarray(grads)
    save_gradient_image(g, os.path.join(args.out, tag + "_color.png"))
    save_gradient_image(convert_to_grayscale(g),
                        os.path.join(args.out, tag + "_gray.png"))
    pos, neg = positive_negative_saliency(g)
    save_gradient_image(pos, os.path.join(args.out, tag + "_pos.png"))
    save_gradient_image(neg, os.path.join(args.out, tag + "_neg.png"))
    print(f"Saved 4 saliency maps for {tag} to {args.out}")


if __name__ == "__main__":
    main()
