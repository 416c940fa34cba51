"""Generate a 'patient frame' series file from an ACDC directory layout —
the role of the reference's committed data/data_series.txt /
test_series.txt listings, derived from the dataset instead of shipped.

Usage: python tools/make_series.py <acdc-root> [--split training|testing]
       [--out data_series.txt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from saunet_tpu.data.acdc import scan_training_dir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--split", default="training",
                    choices=["training", "testing"])
    ap.add_argument("--out", default="data_series.txt")
    args = ap.parse_args()

    if args.split == "training":
        base = os.path.join(args.root, "training")
        pairs = scan_training_dir(base)
    else:
        base = os.path.join(args.root, "testing", "testing")
        if not os.path.isdir(base):
            base = os.path.join(args.root, "testing")
        import re
        pat = re.compile(r"patient(\d+)_frame(\d+)\.nii(\.gz)?$")
        pairs = []
        for d in sorted(os.listdir(base)):
            pd = os.path.join(base, d)
            if not (d.startswith("patient") and os.path.isdir(pd)):
                continue
            for fn in sorted(os.listdir(pd)):
                m = pat.match(fn)
                if m:
                    pairs.append((int(m.group(1)), int(m.group(2))))

    with open(args.out, "w") as f:
        for p, fr in pairs:
            f.write(f"{p} {fr}\n")
    print(f"wrote {len(pairs)} entries to {args.out}")


if __name__ == "__main__":
    main()
