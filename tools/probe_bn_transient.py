"""Attribute the step-210 eval-mIoU dip: eval with EMA running stats vs
the same params evaluated with batch statistics (train-mode BN forward).
If the dip vanishes under batch stats, it is a BN running-stats transient."""
import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tools')
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from saunet_tpu.models import SAUNet
from saunet_tpu.train import create_train_state, make_eval_step, make_train_step, radam
from saunet_tpu.data.phantom import make_phantom_set
import fidelity

steps, batch, hw, n_train, n_val, lr = 300, 8, 64, 64, 16, 1e-3
imgs, labs = make_phantom_set(n_train + n_val, hw=hw, seed=0)
edges = fidelity._edge_targets(labs)
tr_i, tr_l, tr_e = imgs[:n_train], labs[:n_train], edges[:n_train]
va_i, va_l = imgs[n_train:], labs[n_train:]

model = SAUNet(num_classes=4, edge_kernel="xla")
tx = radam(lr)
state = create_train_state(model, tx, jax.random.PRNGKey(0), input_shape=(1, hw, hw, 3))
step = make_train_step(model, tx, donate=False)
eval_step = make_eval_step(model, fused_encoder=False)

@jax.jit
def eval_batchstats(state, images):
    (seg, _), _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, True, mutable=["batch_stats"])
    return jnp.argmax(seg, axis=-1)

img3 = np.repeat(tr_i[..., None], 3, axis=-1)
vimg3 = np.repeat(va_i[..., None], 3, axis=-1)
schedule = fidelity._batches(n_train, batch, steps, seed=123)
rng = jax.random.PRNGKey(1)

def both_evals(state):
    pr, pb = [], []
    for i in range(0, len(va_i), batch):
        vb = {"image": jnp.asarray(vimg3[i:i+batch]),
              "label": jnp.asarray(va_l[i:i+batch]),
              "edge": jnp.asarray(np.zeros((len(va_i[i:i+batch]), hw, hw, 1), np.float32))}
        _, p, _ = eval_step(state, vb)
        pr.append(np.asarray(p))
        pb.append(np.asarray(eval_batchstats(state, vb["image"])))
    m_r, pc_r = fidelity._iou(np.concatenate(pr), va_l, per_class=True)
    m_b, pc_b = fidelity._iou(np.concatenate(pb), va_l, per_class=True)
    return m_r, pc_r, m_b, pc_b

for s, sel in enumerate(schedule, 1):
    b = {"image": jnp.asarray(img3[sel]), "label": jnp.asarray(tr_l[sel]),
         "edge": jnp.asarray(tr_e[sel])}
    rng, k = jax.random.split(rng)
    state, metrics = step(state, b, k)
    if s in (180, 195, 200, 205, 210, 215, 220, 225, 240):
        m_r, pc_r, m_b, pc_b = both_evals(state)
        print(f"step {s}: running-stats mIoU {m_r:.4f} {['%.2f'%v for v in pc_r]}"
              f" | batch-stats mIoU {m_b:.4f} {['%.2f'%v for v in pc_b]}", flush=True)
    if s > 240:
        break
