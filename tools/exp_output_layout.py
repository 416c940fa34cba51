"""Output-layout bisect for the train step (KERNELS.md §9, r4).

Three jit variants of the identical step math differing only in call/
return structure: an unused rng argument (A), step+1 threading (C), and
returning (new_state, metrics-dict) with the big pytree first (B).
Measured on v5e b64 @224²: A 283.2 ms, C 283.5, B 299.3 — the return
structure alone flips XLA onto a worse fusion schedule, which is why
make_train_step jits a flat output and repackages the API outside jit.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp, optax
from saunet_tpu.models import SAUNet
from saunet_tpu.train import create_train_state, make_train_step, radam
from saunet_tpu.train.losses import dual_loss_packed
from saunet_tpu.train.metrics import pixel_acc

B, HW, STEPS = 64, 224, 10
rs = np.random.RandomState(0)
batch = {"image": jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32)),
         "label": jnp.asarray(rs.randint(0, 4, (B, HW, HW)).astype(np.int32)),
         "edge": jnp.asarray((rs.rand(B, HW, HW, 1) > 0.8).astype(np.float32))}
model = SAUNet(num_classes=4, dtype=jnp.bfloat16, stream_impl="packed")
tx = radam(1e-4)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, HW, HW, 3), init_on_cpu=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

def loss_fn(params, stats, b):
    (seg, edge), mut = model.apply({"params": params, "batch_stats": stats},
                                   b["image"], True, mutable=["batch_stats"],
                                   method="train_outputs")
    total, parts = dual_loss_packed(seg, edge, b["label"], b["edge"])
    return total, (mut["batch_stats"], seg, parts)

def body(state, b):
    (_, (stats, seg, parts)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, state.batch_stats, b)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    from saunet_tpu.ops.packed import packed_argmax
    preds = packed_argmax(seg, 4)
    acc, jacc = pixel_acc(preds, b["label"], 4)
    return parts, acc, jacc, stats, params, opt_state

@jax.jit
def v_rng(state, b, rng):          # A: add unused rng arg
    parts, acc, jacc, stats, params, opt_state = body(state, b)
    new_state = state.replace(params=params, batch_stats=stats,
                              opt_state=opt_state)
    return parts["loss"], acc, jacc, new_state

@jax.jit
def v_step(state, b):              # C: thread step+1
    parts, acc, jacc, stats, params, opt_state = body(state, b)
    new_state = state.replace(step=state.step + 1, params=params,
                              batch_stats=stats, opt_state=opt_state)
    return parts["loss"], acc, jacc, new_state

@jax.jit
def v_dict(state, b):              # B: return the metrics dict like the step
    parts, acc, jacc, stats, params, opt_state = body(state, b)
    m = dict(parts); m["acc"] = acc; m["jaccard"] = jacc
    new_state = state.replace(step=state.step + 1, params=params,
                              batch_stats=stats, opt_state=opt_state)
    return new_state, m

def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"{name:12s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms", flush=True)

timeit("A rng-arg", v_rng, state, batch, jax.random.PRNGKey(1))
timeit("C step+1", v_step, state, batch)
timeit("B dict", v_dict, state, batch)
