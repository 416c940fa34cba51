"""Convert a downloaded torch checkpoint to a portable .npz state-dict.

Usage:
    python tools/convert_torchvision.py densenet121.pth encoder.npz

The output feeds `--pretrained` on the train CLI (and
`models.densenet.load_pretrained_encoder` /
`models.resnet.port_resnet_state_dict` programmatically) — the zero-egress
replacement for the reference's on-the-fly downloads
(/root/reference/models/models.py:271, /root/reference/models/resnet.py:220-228).
Conversion is name-preserving: tensors are exported exactly as named in the
torch state_dict; the porting hooks own the name/layout mapping.
"""
from __future__ import annotations

import argparse

import numpy as np


def convert(src: str, dst: str) -> int:
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):  # a whole nn.Module was pickled
        obj = obj.state_dict()
    arrays = {}
    for name, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        arrays[name] = np.asarray(v)
    np.savez(dst, **arrays)
    return len(arrays)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("src", help="torch .pth/.pt checkpoint")
    p.add_argument("dst", help="output .npz path")
    args = p.parse_args(argv)
    n = convert(args.src, args.dst)
    print(f"wrote {n} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
