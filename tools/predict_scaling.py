"""Quantify v5e-8 scaling from the 8-device SPMD lowering (VERDICT r4
task #4).

Real multi-chip hardware is not available in this image, but the full
train step DOES compile and execute over an 8-device virtual CPU mesh
(parallel/dryrun.py — the driver's multichip gate). This tool re-runs
that compile in the same scrubbed subprocess, walks the compiled HLO for
the collectives GSPMD inserted (gradient all-reduces, BN-statistic
reductions, spatial halo collective-permutes), classifies and counts
their bytes, and scales them to the production geometry (224², batch 64
per chip) — param-gradient and BN-stat collectives are geometry-
independent (shapes = parameter/channel shapes); halo bytes scale with
batch x width x halo rows.

Output: the docs/PARALLELISM.md scaling table — predicted per-chip comm
time and DP efficiency at data=8 and data=4 x space=2 under stated ICI
assumptions.

Usage:
  python tools/predict_scaling.py            # parent: runs both meshes
  python tools/predict_scaling.py --child N SPACE   # internal
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# -- production geometry / measured single-chip numbers (BASELINE.md r4) --
STEP_MS = 280.7          # measured single-chip train step, b64 @224²
BATCH_PER_CHIP = 64
HW = 224
# dryrun child geometry (parallel/dryrun.py)
CHILD_HW = 64
CHILD_BATCH_PER_CHIP = 1
# ICI assumption: v5e has 2 ICI axes (2D torus), ~45 GB/s per direction
# per link -> ring all-reduce effective per-chip bandwidth ~90 GB/s
# bidirectional. Stated, not measured (no multi-chip hardware here).
ICI_GBPS = 90.0


#: `%res = <types> <collective>(operands...)` — result types sit between
#: '=' and the op name; operand types (inside the parens) must not be
#: counted. Async pairs appear as -start/-done; only -start is counted.
_HLO_LINE = re.compile(
    r"=\s+(.*?)\s+(all-reduce|all-gather|collective-permute|"
    r"reduce-scatter)(?:-start)?\(")
_HLO_DONE = re.compile(r"-done\(")
_HLO_TYPE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8}


def collect_collectives(hlo_text: str):
    """[(kind, dtype, shape, bytes)] for every collective in the HLO
    (tuple-shaped results contribute one entry per element)."""
    out = []
    for line in hlo_text.splitlines():
        if _HLO_DONE.search(line):
            continue
        m = _HLO_LINE.search(line)
        if not m:
            continue
        result_types, kind = m.group(1), m.group(2)
        for t in _HLO_TYPE.finditer(result_types):
            dtype, dims = t.group(1), t.group(2)
            if dtype not in _DTYPE_BYTES:
                continue
            shape = [int(d) for d in dims.split(",") if d] if dims else []
            n = 1
            for d in shape:
                n *= d
            out.append((kind, dtype, shape, n * _DTYPE_BYTES[dtype]))
    return out


def child_main(n_devices: int, space: int, hw: int = CHILD_HW) -> None:
    import jax
    import numpy as np

    from saunet_tpu.models import SAUNet
    from saunet_tpu.parallel import make_mesh, shard_batch
    from saunet_tpu.train import create_train_state, make_train_step, radam

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices, data=n_devices // space, space=space)
    model = SAUNet(num_classes=4)
    tx = radam(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, hw, hw, 3))
    step = make_train_step(model, tx, donate=False)
    rs = np.random.RandomState(0)
    n = n_devices * CHILD_BATCH_PER_CHIP
    batch = {
        "image": rs.randn(n, hw, hw, 3).astype(np.float32),
        "label": rs.randint(0, 4, size=(n, hw, hw)).astype(np.int32),
        "edge": (rs.rand(n, hw, hw, 1) > 0.8).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)
    compiled = step._jitted.lower(state, batch,
                                  jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    colls = collect_collectives(txt)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print("PREDICT_SCALING_JSON " + json.dumps({
        "mesh": {"data": n_devices // space, "space": space},
        "hw": hw,
        "collectives": [
            {"kind": k, "dtype": d, "shape": s, "bytes": b}
            for k, d, s, b in colls],
        "flops": ca.get("flops") if ca else None,
        "bytes_accessed": ca.get("bytes accessed") if ca else None,
    }))


def run_child(n_devices: int, space: int, hw: int = CHILD_HW) -> dict:
    from saunet_tpu.parallel import dryrun

    env = dryrun.scrubbed_env(n_devices)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(n_devices), str(space), str(hw)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000)
    if proc.returncode != 0:
        raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])
    for line in proc.stdout.splitlines():
        if line.startswith("PREDICT_SCALING_JSON "):
            return json.loads(line[len("PREDICT_SCALING_JSON "):])
    raise RuntimeError("no JSON line in child output:\n" + proc.stdout[-2000:])


def classify(coll_a, coll_b):
    """Empirically split collective bytes into geometry-independent vs
    geometry-scaling by differencing two child geometries (A=64², B=96²):
    a (kind, dtype, shape) entry present in BOTH programs with the same
    multiplicity did not change with the image size — gradients
    (param-shaped, incl. rank-4 conv kernels and the space-mesh's
    kernel all-gathers), BN statistics, scalars. Everything else is
    activation halo/exchange; its growth exponent
    e = log(bytes_B/bytes_A) / log(96/64) says whether it scales with
    width (e~1, conv halo rows) or area (e~2, full-map gathers).

    Sanity anchor: pure-DP all-reduce total = 128.0 MB = 31.87 M params
    x 4 B + ~0.5 MB BN/scalars, and pure DP has zero scaling bytes."""
    from collections import Counter

    def key(c):
        return (c["kind"], c["dtype"], tuple(c["shape"]), c["bytes"])

    ka, kb = Counter(map(key, coll_a)), Counter(map(key, coll_b))
    inter = ka & kb
    const = sum(k[3] * m for k, m in inter.items())
    scal_a = sum(k[3] * m for k, m in (ka - inter).items())
    scal_b = sum(k[3] * m for k, m in (kb - inter).items())
    top = sorted(((k[3], k) for k, m in (ka - inter).items()),
                 reverse=True)[:6]
    return const, scal_a, scal_b, [k for _, k in top]


def report(res_a, res_b, f=sys.stdout):
    import math

    data, space = res_a["mesh"]["data"], res_a["mesh"]["space"]
    n = data * space
    const, scal_a, scal_b, top = classify(res_a["collectives"],
                                          res_b["collectives"])
    hw_a, hw_b = res_a["hw"], res_b["hw"]
    if scal_a > 0 and scal_b > scal_a:
        exponent = math.log(scal_b / scal_a) / math.log(hw_b / hw_a)
    else:
        exponent = 0.0
    # activation bytes scale linearly with per-chip batch and with
    # width^e (e measured from the 64²->96² growth); HLO shapes are
    # per-device already
    halo_prod = scal_a * (BATCH_PER_CHIP / CHILD_BATCH_PER_CHIP) \
        * (HW / hw_a) ** exponent
    # ring all-reduce: each chip moves ~2*(n-1)/n * bytes; halo/exchange
    # tensors are the per-device communicated buffers themselves
    ar_ms = 2 * (n - 1) / n * const / (ICI_GBPS * 1e9) * 1e3
    halo_ms = halo_prod / (ICI_GBPS * 1e9) * 1e3
    comm_ms = ar_ms + halo_ms
    eff = STEP_MS / (STEP_MS + comm_ms)
    sl = BATCH_PER_CHIP / (STEP_MS + comm_ms) * 1e3
    kinds = {}
    for c in res_a["collectives"]:
        kinds[c["kind"]] = kinds.get(c["kind"], 0) + 1
    print(f"mesh data={data} x space={space} (n={n}):", file=f)
    print(f"  collectives in compiled HLO: {kinds}", file=f)
    print(f"  geometry-independent bytes/step (grads+BN+scalars+kernel "
          f"gathers): {const/1e6:.1f} MB", file=f)
    print(f"  geometry-scaling bytes: {scal_a/1e6:.2f} MB @{hw_a}² -> "
          f"{scal_b/1e6:.2f} MB @{hw_b}² (exponent {exponent:.2f}) -> "
          f"{halo_prod/1e6:.1f} MB @{HW}² b{BATCH_PER_CHIP}/chip", file=f)
    for kind, dt_, shape, b in top:
        print(f"    {kind:<19s} {dt_}{list(shape)} {b/1e6:8.2f} MB",
              file=f)
    print(f"  per-chip comm @ {ICI_GBPS:.0f} GB/s: all-reduce "
          f"{ar_ms:.2f} ms + halo {halo_ms:.2f} ms = {comm_ms:.2f} ms "
          f"(unoverlapped worst case)", file=f)
    print(f"  predicted step {STEP_MS + comm_ms:.1f} ms -> "
          f"{sl:.1f} slices/sec/chip, DP efficiency {eff*100:.1f}%",
          file=f)
    return {"mesh": res_a["mesh"], "const_mb": const / 1e6,
            "halo_mb_scaled": halo_prod / 1e6,
            "halo_exponent": exponent, "comm_ms": comm_ms,
            "efficiency_pct": eff * 100, "slices_per_sec_per_chip": sl}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        hw = int(sys.argv[4]) if len(sys.argv) > 4 else CHILD_HW
        child_main(int(sys.argv[2]), int(sys.argv[3]), hw)
        return
    rows = []
    for n, space in ((8, 1), (8, 2)):
        res64 = run_child(n, space, 64)
        res96 = run_child(n, space, 96)
        rows.append(report(res64, res96))
    out = os.path.join(REPO, "docs", "scaling_v5e8.json")
    with open(out, "w") as fh:
        json.dump({"assumptions": {
            "single_chip_step_ms": STEP_MS,
            "batch_per_chip": BATCH_PER_CHIP, "hw": HW,
            "ici_gbps_ring": ICI_GBPS,
            "method": "constant-vs-scaling split by 64²/96² HLO diff; "
                      "scaling bytes extrapolated by width^e x batch",
        }, "rows": rows}, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
