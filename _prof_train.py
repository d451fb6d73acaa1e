import _cachecfg  # persistent compile cache
import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from posecnn_tpu.engine.train import TrainHParams, compute_losses, create_train_state, make_optimizer
import optax, dataclasses

cfg = dataclasses.replace(_flagship_cfg(is_train=True), keep_prob=1.0)
hp = TrainHParams()
B, H, W, C = 2, 480, 640, 22
rng = np.random.RandomState(0)
state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
params, opt_state, step0 = state
points = jnp.asarray(rng.randn(C, 512, 3).astype(np.float32) * 0.05)
symmetry = jnp.zeros((C,), jnp.float32)
extents = jnp.ones((C, 3), jnp.float32) * 0.1
meta = np.zeros((B, 48), np.float32); meta[:, 0] = meta[:, 4] = 1066.0; meta[:, 2] = 320; meta[:, 5] = 240
batch = {
    "data": jnp.asarray(rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)),
    "gt_label_2d": jnp.asarray(rng.randint(0, C, (B, H, W)).astype(np.int32)),
    "gt_centers": jnp.asarray(rng.rand(B, 8, 4).astype(np.float32) * 100),
    "meta_data": jnp.asarray(meta),
    "poses": jnp.zeros((8, 13), jnp.float32),
}
key = jax.random.PRNGKey(1)
tx = make_optimizer(hp)

def chain(f, iters=10):
    s = f(jnp.float32(0)); jax.device_get(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(s)
    jax.device_get(s)
    return (time.perf_counter() - t0) / iters * 1e3

@jax.jit
def fwd_only(seed):
    b = dict(batch); b["meta_data"] = batch["meta_data"] + seed * 0
    loss, _ = compute_losses(params, cfg, hp, b, points, symmetry, extents, key)
    return loss * 1e-12

@jax.jit
def fwd_bwd(seed):
    b = dict(batch); b["meta_data"] = batch["meta_data"] + seed * 0
    (loss, _), grads = jax.value_and_grad(compute_losses, has_aux=True)(params, cfg, hp, b, points, symmetry, extents, key)
    return (loss + jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x), grads, 0.0)) * 1e-12

@jax.jit
def full_step(seed):
    b = dict(batch); b["meta_data"] = batch["meta_data"] + seed * 0
    (loss, _), grads = jax.value_and_grad(compute_losses, has_aux=True)(params, cfg, hp, b, points, symmetry, extents, key)
    updates, o2 = tx.update(grads, opt_state, params)
    p2 = optax.apply_updates(params, updates)
    return (loss + jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x), p2, 0.0)) * 1e-12

print("fwd loss only ", round(chain(fwd_only), 2), "ms")
print("fwd+bwd       ", round(chain(fwd_bwd), 2), "ms")
print("full step     ", round(chain(full_step), 2), "ms")
