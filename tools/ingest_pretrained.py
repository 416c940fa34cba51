"""One-command, checksummed ingestion of ImageNet DenseNet-121 weights.

The reference warm-starts its encoder unconditionally from torchvision's
ImageNet checkpoint (/root/reference/models/models.py:271 —
``densenet121(pretrained=True)``, which downloads
``densenet121-a639ec97.pth``). This environment has zero egress, so the
checkpoint must be supplied as a file; this tool is the complete recipe from
that file to a ``--pretrained``-ready archive:

    python tools/ingest_pretrained.py /path/to/densenet121-a639ec97.pth \
        --out weights/densenet121_imagenet.npz

It 1) verifies the source file's SHA-256 against torch-hub's embedded
checksum (the 8-hex suffix in the canonical filename) or an explicit
``--sha256``; 2) converts to a portable .npz (name-preserving — the porting
hooks in models/densenet.py own layout mapping); 3) smoke-grafts the result
onto a freshly-initialized SAUNet TrainState (every leaf shape-checked);
4) writes a ``<out>.sha256`` manifest so downstream loads can re-verify.

Skip-guarded test: tests/test_pretrained.py::test_real_weights_ingestion
runs this end-to-end when SAUNET_PRETRAINED_PTH points at the archive and
skips otherwise.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys

#: canonical torch-hub filename -> its embedded sha256 prefix
_HUB_SUFFIX = re.compile(r"-([0-9a-f]{8,64})\.pth$")


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_checksum(src: str, expected: str | None) -> str:
    """Return the verified digest. `expected` may be a full digest, a
    prefix (torch-hub embeds the first 8 hex chars in the filename), or
    None — in which case the filename's embedded prefix is required."""
    if expected is None:
        m = _HUB_SUFFIX.search(os.path.basename(src))
        if not m:
            raise SystemExit(
                f"{src}: no torch-hub checksum suffix in filename and no "
                "--sha256 given; refusing unverified ingestion. Pass "
                "--sha256 <digest-or-prefix> (torchvision densenet121 is "
                "a639ec97...) or --sha256 SKIP to ingest anyway.")
        expected = m.group(1)
    digest = sha256_file(src)
    if expected != "SKIP" and not digest.startswith(expected.lower()):
        raise SystemExit(
            f"{src}: sha256 {digest} does not match expected "
            f"{expected!r} — wrong or corrupted checkpoint.")
    return digest


def ingest(src: str, out: str, sha256: str | None = None,
           smoke_graft: bool = True) -> dict:
    digest = verify_checksum(src, sha256)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_torchvision import convert

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    n = convert(src, out)

    grafted = 0
    if smoke_graft:
        # end-to-end proof: the archive grafts onto a real model state with
        # every leaf shape-checked (raises on any mismatch)
        import jax
        import optax

        from saunet_tpu.models import SAUNet
        from saunet_tpu.models.densenet import load_pretrained_encoder
        from saunet_tpu.train import create_train_state

        model = SAUNet(num_classes=4)
        state = create_train_state(model, optax.sgd(1e-3),
                                   jax.random.PRNGKey(0),
                                   input_shape=(1, 64, 64, 3))
        state = load_pretrained_encoder(out, state)
        grafted = len(jax.tree.leaves(state.params["encoder"]))

    manifest = f"{digest}  {os.path.basename(src)}\n"
    with open(out + ".sha256", "w") as f:
        f.write(manifest)
    return {"src_sha256": digest, "tensors": n, "grafted_leaves": grafted,
            "out": out}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("src", help="torchvision densenet121 .pth checkpoint "
                               "(canonical: densenet121-a639ec97.pth)")
    p.add_argument("--out", default="weights/densenet121_imagenet.npz")
    p.add_argument("--sha256", default=None,
                   help="expected digest or prefix; default: the torch-hub "
                        "suffix embedded in the filename; SKIP to bypass")
    p.add_argument("--no_smoke_graft", action="store_true",
                   help="skip the graft-onto-fresh-init verification")
    args = p.parse_args(argv)
    info = ingest(args.src, args.out, args.sha256,
                  smoke_graft=not args.no_smoke_graft)
    print(f"verified sha256={info['src_sha256'][:16]}…  "
          f"{info['tensors']} tensors -> {info['out']}"
          + (f"  (grafted {info['grafted_leaves']} encoder leaves)"
             if info["grafted_leaves"] else ""))
    print(f"train with: python -m saunet_tpu.cli.train --data_root <ACDC> "
          f"--pretrained {info['out']}")


if __name__ == "__main__":
    main()
