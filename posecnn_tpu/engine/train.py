"""Training engine: jit-compiled data-parallel train step + solver loop.

Replaces the reference driver (`lib/fcn/train.py`):
  * losses assembled exactly like `train_net` (train.py:478-534): hard-label
    cross entropy + weighted smooth-L1 vertex loss + ADD/ADD-S pose loss +
    L2 weight regularization (+ optional domain-adversarial CE);
  * optimizer: SGD momentum with staircase exponential LR decay
    (train.py:529-534) via optax;
  * one fused jit step (forward + hough + heads + backward + update) —
    the reference ran this as one TF session graph per iteration;
  * data parallelism over a `Mesh`'s "data" axis: params replicated, batch
    sharded, gradient psum inserted by XLA from output shardings (the
    reference is single-device; SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params, posecnn_forward
from posecnn_tpu.ops.add_loss import average_distance_loss
from posecnn_tpu.ops.losses import (
    loss_cross_entropy_single_frame,
    smooth_l1_loss,
    smooth_l1_loss_vertex,
    sparse_softmax_cross_entropy,
)
from posecnn_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
)


def state_shardings(mesh: Mesh, state):
    """Sharding tree for (params, opt_state, step): parameters (and their
    momentum mirrors) follow `param_sharding` — replicated on a (N,1) mesh,
    channel-sharded over the model axis for large kernels when model>1 (TP);
    the step counter is replicated."""
    params, opt_state, _ = state
    rule = lambda path, leaf: param_sharding(mesh, path=jax.tree_util.keystr(path), leaf=leaf)
    return (
        jax.tree_util.tree_map_with_path(rule, params),
        jax.tree_util.tree_map_with_path(rule, opt_state),
        replicated(mesh),
    )


@dataclass(frozen=True)
class TrainHParams:
    learning_rate: float = 0.001
    momentum: float = 0.9
    gamma: float = 0.1
    stepsize: int = 30000
    weight_reg: float = 0.0001
    vertex_w: float = 5.0
    pose_w: float = 1.0
    adapt_weight: float = 0.1
    # ADD loss hinge (vgg16_convs.py:194). NOTE the reference hinges on the
    # *squared* distance, so 0.01 is a (10 cm)^2 dead zone — larger than most
    # YCB objects' span, leaving almost no pose gradient. Kept as the parity
    # default; training configs that want a learning pose head set
    # TRAIN.POSE_MARGIN to ~1e-4 ((1 cm)^2).
    margin: float = 0.01
    # normalize the ADD loss by the number of *valid* hough rows instead of
    # the padded slot count (the reference divides by its dynamic ROI count;
    # our fixed-shape row padding otherwise attenuates the loss ~1.6x)
    pose_norm_valid: bool = False
    vertex_w_inside: float = 10.0  # fg weight in vertex targets (minibatch.py:577)
    # TPU.VERTEX_Z_OBJ_NORM: object-normalized log-z channel weighting (see
    # ops/vertex_targets.smooth_l1_loss_vertex_sparse) — counters the
    # measured ~0.85-slope depth attenuation toward the pixel-weighted z
    # prior. Off by default (reference parity).
    vertex_z_obj_norm: bool = False
    # render-and-compare matching loss weight (reference TRAIN.MATCHING flag;
    # the op existed but no reference network wired it — opt-in here too)
    matching_w: float = 0.0
    # quaternion-space auxiliary loss weight (no reference counterpart).
    # The ADD loss's gradient through closest-point distances is nearly
    # uninformative while the predicted rotation is far from GT (the
    # isolation trajectory in output/isolate_pose/report.json plateaus at
    # ~110 deg until loss_pose < 0.1); min(|q-q*|^2, |q+q*|^2) on the
    # class-sliced unit quaternion has strong gradients everywhere and a
    # minimum consistent with the ADD optimum. Applied to non-symmetric
    # classes only (symmetric targets are ambiguous up to the symmetry
    # group, exactly why ADD-S exists).
    quat_w: float = 0.0
    # global-norm gradient clipping; 0 = off (reference parity). From-scratch
    # VGG training (no ImageNet init) diverges within ~20 iters without it.
    clip_grad_norm: float = 0.0
    # BGR means for on-device preprocessing of uint8 batches (config.py:242)
    pixel_means: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)


def lr_schedule(hp: TrainHParams):
    """tf.train.exponential_decay(staircase=True) equivalent."""
    return optax.exponential_decay(
        init_value=hp.learning_rate,
        transition_steps=hp.stepsize,
        decay_rate=hp.gamma,
        staircase=True,
    )


def make_optimizer(hp: TrainHParams):
    """Momentum SGD with the lr applied OUTSIDE optax's own step count.

    The optimizer is built at unit learning rate; step functions scale the
    updates by `lr_schedule(hp)(step)` where `step` is the solver's state
    counter (restored on resume). Passing the schedule to optax.sgd keeps
    the decay clock in ScaleByScheduleState, which re-inits to count=0 on a
    CHECKPOINT_OPT_STATE=False resume: a post-decay resume then silently
    trains at sched(0)=LEARNING_RATE while logging sched(step) — observed
    live in the round-5 z A/B, where a 160K->172K fine-tune applied 1e-3
    instead of the logged 1e-4 and destroyed the model (val IoU 0.894->0.52,
    median weight drift 53% in 12K iters vs 6% per 10K in-run). Driving the
    lr off the restored step makes logged == applied under any resume."""
    sgd = optax.sgd(1.0, momentum=hp.momentum, nesterov=False)
    if hp.clip_grad_norm > 0:
        return optax.chain(optax.clip_by_global_norm(hp.clip_grad_norm), sgd)
    return sgd


def scale_updates(updates, lr):
    """Scale unit-lr optimizer updates by the scheduled learning rate."""
    return jax.tree_util.tree_map(lambda u: u * lr, updates)


def regularization_loss(params: Dict, scale: float) -> jnp.ndarray:
    """tf.contrib.layers.l2_regularizer: scale * sum(w^2)/2 over conv/fc
    weights+biases; bilinear deconv filters carry no regularizer
    (network.py:166-186 vs make_deconv_filter:141-157)."""
    total = 0.0
    for name, p in params.items():
        if name.startswith("upscore"):
            continue
        # GRU/video cells nest deeper than {layer: {w, b}} — walk all leaves
        for leaf in jax.tree_util.tree_leaves(p):
            total = total + jnp.sum(jnp.square(leaf))
    return scale * 0.5 * total


def compute_losses(
    params: Dict,
    model_cfg: PoseCNNConfig,
    hp: TrainHParams,
    batch: Dict[str, jnp.ndarray],
    points: jnp.ndarray,
    symmetry: jnp.ndarray,
    extents: jnp.ndarray,
    rng: jax.Array,
    forward_fn: Optional[Callable] = None,
    ce_threshold: Optional[float] = None,
    points_raw: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """forward_fn defaults to the flagship posecnn_forward; pass
    posecnn_full_forward (same endpoint dict contract) to train vgg16_full.
    ce_threshold overrides the hard-label gate (vgg16_full hard-codes 0.7,
    vgg16_full.py:131)."""
    forward = forward_fn if forward_fn is not None else posecnn_forward
    thr = model_cfg.threshold_label if ce_threshold is None else ce_threshold
    data = batch["data"]
    means = jnp.asarray(hp.pixel_means, jnp.float32).reshape(1, 1, 1, 3)
    if data.dtype == jnp.uint8:
        # device-side preprocessing: host ships raw uint8 BGR frames
        data = data.astype(jnp.float32)
        if "chroma_dhls" in batch:
            # in-graph HLS chromatic jitter (CHROMATIC fast path): the host
            # draws only the per-image deltas; ordering matches the host
            # pipeline (chromatic before noise, blob.py)
            from posecnn_tpu.ops.chromatic import chromatic_device

            data = chromatic_device(data, batch["chroma_dhls"])
        if "noise_sigma" in batch:
            # in-graph gaussian augmentation noise (ADD_NOISE fast path):
            # per-image sigma from the host RNG stream, one (H,W) field
            # shared across channels like the reference (blob.py:76-131),
            # clipped to uint8 range before mean subtraction
            rng, r_noise = jax.random.split(rng)
            field = jax.random.normal(r_noise, data.shape[:3], jnp.float32)
            data = jnp.clip(
                data + batch["noise_sigma"][:, None, None, None] * field[..., None],
                0.0, 255.0,
            )
        data = data - means
    fwd_kwargs = dict(
        gt_poses=batch.get("poses"),
        gt_label_2d=batch["gt_label_2d"],
        rng=rng,
    )
    if getattr(model_cfg, "hough_from_gt", False) or (
        getattr(model_cfg, "hough_gt_mix", 0.0) > 0.0
    ):
        fwd_kwargs["gt_centers"] = batch["gt_centers"]
    if forward is posecnn_forward:
        data_p = batch.get("data_p")
        if data_p is not None and data_p.dtype == jnp.uint8:
            data_p = data_p.astype(jnp.float32) - means
        fwd_kwargs["data_p"] = data_p
    out = forward(params, model_cfg, data, extents, batch["meta_data"], **fwd_kwargs)
    losses: Dict[str, jnp.ndarray] = {}
    loss = regularization_loss(params, hp.weight_reg)
    losses["loss_regu"] = loss

    # fused hard_label + CE on raw logits: avoids materializing the dense
    # one-hot / softmax / log-softmax (B,H,W,C) tensors in the train graph
    from posecnn_tpu.ops.losses import loss_cross_entropy_hard_label_sparse

    loss_cls = loss_cross_entropy_hard_label_sparse(
        out["score"], batch["gt_label_2d"], thr
    )
    losses["loss_cls"] = loss_cls
    loss = loss + loss_cls

    if model_cfg.vertex_reg:
        if "vertex_targets3" in batch:
            # compact VERTEX_REG_3D targets (scaled object coordinates)
            from posecnn_tpu.ops.vertex_targets import smooth_l1_loss_vertex_sparse3d

            loss_vertex = hp.vertex_w * smooth_l1_loss_vertex_sparse3d(
                out["vertex_pred"], batch["gt_label_2d"],
                batch["vertex_targets3"], batch["vertex_weights3"],
                model_cfg.num_classes,
            )
        elif "vertex_targets" in batch:
            vtargets, vweights = batch["vertex_targets"], batch["vertex_weights"]
            loss_vertex = hp.vertex_w * smooth_l1_loss_vertex(
                out["vertex_pred"], vtargets, vweights
            )
        else:
            # fused in-graph target generation + loss from the small
            # GT-center table (no (B,H,W,3C) target blobs)
            from posecnn_tpu.ops.vertex_targets import smooth_l1_loss_vertex_sparse

            loss_vertex = hp.vertex_w * smooth_l1_loss_vertex_sparse(
                out["vertex_pred"], batch["gt_label_2d"], batch["gt_centers"],
                model_cfg.num_classes, hp.vertex_w_inside,
                z_obj_norm=hp.vertex_z_obj_norm,
            )
        losses["loss_vertex"] = loss_vertex
        loss = loss + loss_vertex

        if model_cfg.pose_reg:
            loss_pose = average_distance_loss(
                out["poses_pred"],
                out["poses_target"],
                out["poses_weight"],
                points,
                symmetry,
                hp.margin,
            )
            if hp.pose_norm_valid:
                n_rows = out["poses_pred"].shape[0]
                n_valid = jnp.maximum(
                    jnp.sum(out["rois_valid"].astype(jnp.float32)), 1.0
                )
                loss_pose = loss_pose * (n_rows / n_valid)
            loss_pose = hp.pose_w * loss_pose
            losses["loss_pose"] = loss_pose
            loss = loss + loss_pose

            if hp.quat_w > 0:
                R_, C4 = out["poses_pred"].shape
                Cq = C4 // 4
                qp = out["poses_pred"].reshape(R_, Cq, 4)
                qt = out["poses_target"].reshape(R_, Cq, 4)
                wq = out["poses_weight"].reshape(R_, Cq, 4)[..., 0]
                nonsym = (symmetry[:Cq] <= 0).astype(jnp.float32)[None, :]
                per_roi = jnp.minimum(
                    jnp.sum(jnp.square(qp - qt), axis=-1),
                    jnp.sum(jnp.square(qp + qt), axis=-1),
                ) * wq * nonsym
                n_valid = jnp.maximum(
                    jnp.sum(out["rois_valid"].astype(jnp.float32)), 1.0
                )
                loss_quat = hp.quat_w * jnp.sum(per_roi) / n_valid
                losses["loss_quat"] = loss_quat
                loss = loss + loss_quat

            if hp.matching_w > 0:
                # render-and-compare matching loss (reference TRAIN.MATCHING /
                # lib/matching_loss: render predicted vs GT pose, compare) —
                # differentiable soft-splat formulation
                from posecnn_tpu.ops.matching_loss import render_compare_batched

                loss_match = hp.matching_w * render_compare_batched(
                    out["poses_pred"],
                    out["poses_target"],
                    out["poses_weight"],
                    out["poses_init"],
                    out["rois"],
                    # raw meter-scale clouds: the render projects through the
                    # real camera intrinsics, so the ADD loss's rescaled
                    # points (10x-160x) would splat far outside the ROI
                    points if points_raw is None else points_raw,
                    batch["meta_data"][0],
                    model_cfg.num_classes,
                )
                losses["loss_matching"] = loss_match
                loss = loss + loss_match

            if model_cfg.adaptation:
                loss_domain = hp.adapt_weight * sparse_softmax_cross_entropy(
                    out["domain_score"], out["label_domain"]
                )
                losses["loss_domain"] = loss_domain
                loss = loss + loss_domain

    losses["loss"] = loss
    return loss, losses


def make_train_step(
    model_cfg: PoseCNNConfig,
    hp: TrainHParams,
    mesh: Mesh,
    points: jnp.ndarray,
    symmetry: jnp.ndarray,
    extents: jnp.ndarray,
    donate: bool = True,
    forward_fn: Optional[Callable] = None,
    ce_threshold: Optional[float] = None,
    points_raw: Optional[jnp.ndarray] = None,
) -> Callable:
    """Build the jitted, mesh-sharded train step.

    state: (params, opt_state, step); batch: dict of host arrays.
    Returns (state, metrics) with metrics replicated.
    """
    tx = make_optimizer(hp)
    sched = lr_schedule(hp)

    def step_fn(state, batch, rng):
        params, opt_state, step = state
        (loss, losses), grads = jax.value_and_grad(
            compute_losses, has_aux=True
        )(params, model_cfg, hp, batch, points, symmetry, extents, rng,
          forward_fn, ce_threshold, points_raw)
        lr = sched(step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, scale_updates(updates, lr))
        losses["lr"] = lr
        return (params, opt_state, step + 1), losses

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)

    def batch_shardings(batch):
        out = {}
        for k, v in batch.items():
            # per-image arrays shard over data; global blobs replicate
            if k in ("data", "data_p", "gt_label_2d", "vertex_targets", "vertex_weights", "vertex_targets3", "vertex_weights3", "meta_data", "gt_centers", "noise_sigma", "chroma_dhls"):
                out[k] = bsh
            else:
                out[k] = repl
        return out

    # on a single-device mesh, explicit NamedShardings are pure overhead —
    # on tunneled device platforms they force a host round-trip of the full
    # 1GB state every step (measured 3.5 s/iter vs 66 ms with plain jit)
    multi_device = mesh.devices.size > 1

    def jitted(state, batch, rng):
        if not multi_device:
            f = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
            return f(state, batch, rng)
        shardings = batch_shardings(batch)
        ssh = state_shardings(mesh, state)
        f = jax.jit(
            step_fn,
            in_shardings=(ssh, shardings, repl),
            out_shardings=(ssh, repl),
            donate_argnums=(0,) if donate else (),
        )
        return f(state, batch, rng)

    return jitted


def _assemble_pose_rows(rows: jnp.ndarray, max_gt: int) -> jnp.ndarray:
    """(B,G,13) per-frame GT pose rows -> (max_gt,13) batch `poses` blob.

    Fills column 0 with the in-batch image index for real rows, then packs
    valid rows first (stable sort on validity) and truncates/pads to the
    static max_gt cap — the same cap the host assembler applies
    (minibatch.py `gt` blob).
    """
    B, G, _ = rows.shape
    valid = rows[:, :, 1] > 0
    bidx = jnp.broadcast_to(
        jnp.arange(B, dtype=rows.dtype)[:, None], (B, G)
    )
    rows = rows.at[:, :, 0].set(jnp.where(valid, bidx, 0.0))
    flat = rows.reshape(B * G, 13)
    vflat = valid.reshape(B * G)
    order = jnp.argsort(~vflat, stable=True)
    flat = flat[order]
    if B * G >= max_gt:
        return flat[:max_gt]
    return jnp.zeros((max_gt, 13), flat.dtype).at[: B * G].set(flat)


def make_bank_train_step(
    model_cfg: PoseCNNConfig,
    hp: TrainHParams,
    points: jnp.ndarray,
    symmetry: jnp.ndarray,
    extents: jnp.ndarray,
    batch_size: int,
    max_gt: int = 24,
    chromatic: bool = False,
    add_noise: bool = False,
    donate: bool = True,
    points_raw: Optional[jnp.ndarray] = None,
) -> Callable:
    """Train step over a device-resident data bank (data/device_bank.py).

    Signature matches make_train_step's (state, batch, rng) contract with
    the bank dict standing in for the per-iteration batch, so the Solver
    drives it with `itertools.repeat(bank)` and zero host work per step:
    frame sampling, batch assembly, and augmentation-parameter draws all
    run inside the jit graph.

    Augmentation parity with the host pipeline (same distributions, a
    different RNG stream): chromatic -> per-image HLS deltas
    U(-.5,.5)*(0.02*180, 0.2*256, 0.2*256) [blob.py:69-74]; noise -> 90%
    gate with sigma = sqrt(U(0,1)*0.3*256) [blob.py add_noise]. The 10%
    motion-blur arm is host-only cv2 and is approximated as sigma=0 here.

    Single-device by design: the flagship accuracy runs train one chip;
    multi-chip sharding keeps using make_train_step's host-fed path.
    """
    tx = make_optimizer(hp)
    sched = lr_schedule(hp)

    def step_fn(state, bank, rng):
        params, opt_state, step = state
        r_idx, r_chroma, r_gate, r_sigma, r_loss = jax.random.split(rng, 5)
        N = bank["data"].shape[0]
        idx = jax.random.randint(r_idx, (batch_size,), 0, N)
        batch = {
            "data": jnp.take(bank["data"], idx, axis=0),
            "gt_label_2d": jnp.take(bank["label"], idx, axis=0).astype(
                jnp.int32
            ),
            "meta_data": jnp.take(bank["meta_data"], idx, axis=0),
            "gt_centers": jnp.take(bank["gt_centers"], idx, axis=0),
            "poses": _assemble_pose_rows(
                jnp.take(bank["pose_rows"], idx, axis=0), max_gt
            ),
        }
        if chromatic:
            u = jax.random.uniform(r_chroma, (batch_size, 3)) - 0.5
            batch["chroma_dhls"] = u * jnp.asarray(
                [0.02 * 180.0, 0.2 * 256.0, 0.2 * 256.0], jnp.float32
            )
        if add_noise:
            gate = jax.random.uniform(r_gate, (batch_size,)) < 0.9
            sigma = jnp.sqrt(
                jax.random.uniform(r_sigma, (batch_size,)) * 0.3 * 256.0
            )
            batch["noise_sigma"] = jnp.where(gate, sigma, 0.0)
        (loss, losses), grads = jax.value_and_grad(
            compute_losses, has_aux=True
        )(params, model_cfg, hp, batch, points, symmetry, extents, r_loss,
          None, None, points_raw)
        lr = sched(step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, scale_updates(updates, lr))
        losses["lr"] = lr
        return (params, opt_state, step + 1), losses

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_seg_train_step(apply_fn: Callable, hp: TrainHParams, num_classes: int):
    """Train step for the segmentation-only variants (RESNET50 / FCN8VGG).

    The reference routes these through the plain cross-entropy branch of
    train_net (lib/fcn/train.py:482-488 for FCN8VGG: one-hot GT labels
    against the log-softmax, normalized by the label mass) with L2
    regularization on conv weights only (BN means/variances carry no
    regularizer, network.py:530-556).

    apply_fn: (params, data_f32, rng) -> endpoint dict with 'prob'
    (log-softmax). Returns jitted (state, batch, rng) -> (state, metrics);
    state = (params, opt_state, step).
    """
    tx = make_optimizer(hp)
    sched = lr_schedule(hp)
    means = jnp.asarray(hp.pixel_means, jnp.float32).reshape(1, 1, 1, 3)

    def loss_fn(params, data, gt_label, rng):
        if data.dtype == jnp.uint8:
            data = data.astype(jnp.float32) - means
        out = apply_fn(params, data, rng)
        logp = out["prob"]
        C = logp.shape[-1]
        valid = (gt_label >= 0)[..., None]
        onehot = jax.nn.one_hot(jnp.clip(gt_label, 0, C - 1), C) * valid
        loss_cls = loss_cross_entropy_single_frame(logp, onehot)
        reg = 0.0
        for name, p in params.items():
            if name.startswith(("upscore", "bn")):
                continue
            for leaf in p.values():
                reg = reg + jnp.sum(jnp.square(leaf))
        loss = loss_cls + hp.weight_reg * 0.5 * reg
        return loss, {"loss": loss, "loss_cls": loss_cls}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        params, opt_state, it = state
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch["data"], batch["gt_label_2d"], rng
        )
        lr = sched(it)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, scale_updates(updates, lr))
        metrics["lr"] = lr
        return (params, opt_state, it + 1), metrics

    return step


def create_train_state(model_cfg: PoseCNNConfig, hp: TrainHParams, rng: jax.Array):
    params = init_posecnn_params(rng, model_cfg)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    return (params, opt_state, jnp.asarray(0, jnp.int32))


class Solver:
    """Iteration loop with snapshotting — `SolverWrapper` (train.py:22-91).

    data_layer must yield batch dicts; snapshots go through
    `posecnn_tpu.core.checkpoint`.
    """

    def __init__(
        self,
        model_cfg: PoseCNNConfig,
        hp: TrainHParams,
        mesh: Optional[Mesh] = None,
        points=None,
        symmetry=None,
        extents=None,
        output_dir: Optional[str] = None,
        snapshot_iters: int = 10000,
        snapshot_prefix: str = "posecnn",
        display: int = 20,
        seed: int = 3,
        snapshot_opt_state: bool = True,
        forward_fn=None,
        ce_threshold=None,
        snapshot_format: str = "npz",
        points_raw=None,
        vis_hook=None,
        step_fn=None,
        snapshot_final: bool = True,
    ):
        self.model_cfg = model_cfg
        self.hp = hp
        self.mesh = mesh or make_mesh()
        self.points = jnp.asarray(points)
        self.symmetry = jnp.asarray(symmetry)
        self.extents = jnp.asarray(extents)
        self.output_dir = output_dir
        self.snapshot_iters = snapshot_iters
        self.snapshot_prefix = snapshot_prefix
        self.snapshot_opt_state = snapshot_opt_state
        self.snapshot_format = snapshot_format
        # TRAIN.SNAPSHOT_FINAL: measurement runs skip the end-of-run
        # snapshot (the periodic and signal snapshots are unaffected)
        self.snapshot_final = snapshot_final
        self.display = display
        # TRAIN.VISUALIZE: callable (iteration, batch) -> None rendering the
        # assembled minibatch (engine.visualize.MinibatchVisualizer)
        self.vis_hook = vis_hook
        self.rng = jax.random.PRNGKey(seed)
        # step_fn override: device-bank training (make_bank_train_step)
        # keeps the same (state, batch, rng) contract with the bank dict
        # standing in for the batch
        self.step_fn = step_fn or make_train_step(
            model_cfg, hp, self.mesh, self.points, self.symmetry, self.extents,
            forward_fn=forward_fn, ce_threshold=ce_threshold,
            points_raw=None if points_raw is None else jnp.asarray(points_raw),
        )
        from posecnn_tpu.core.metrics import MetricsLogger

        self.metrics_logger = MetricsLogger(output_dir) if output_dir else None

    def resume(self, state, log: Optional[Callable] = print):
        """Restore the latest snapshot from output_dir if one exists.

        The reference has no crash recovery — a crash loses up to
        SNAPSHOT_ITERS iterations and restarts require manual --ckpt plumbing
        (SURVEY.md §5). Returns (state, start_iter).
        """
        from posecnn_tpu.core.checkpoint import latest_checkpoint, restore_checkpoint

        if not self.output_dir:
            return state, 0
        path = latest_checkpoint(self.output_dir, prefix=self.snapshot_prefix)
        if path is None:
            return state, 0
        state = restore_checkpoint(path, state)
        start = int(state[2])
        if log:
            log(f"resumed from {path} at iteration {start}")
        return state, start

    def train(
        self,
        data_iter,
        state,
        max_iters: int,
        log: Optional[Callable] = print,
        start_iter: int = 0,
        handle_signals: bool = True,
    ):
        """Iteration loop. With `handle_signals`, SIGTERM/SIGINT trigger a
        final snapshot before returning (checkpoint-on-preemption), so
        `resume()` restarts from the interrupted step rather than the last
        periodic snapshot."""
        import signal

        from posecnn_tpu.utils.timer import Timer

        if start_iter:
            # with DEVICE_BANK all sampling/augmentation randomness derives
            # from this stream; without folding in the resume point every
            # supervisor kill+resume would replay the iteration-0 sample
            # sequence (stall-prone runs would retrain the same early frames)
            self.rng = jax.random.fold_in(self.rng, start_iter)

        if log is not None:
            # a SIGTERM that also kills a downstream pipe consumer (e.g.
            # `timeout trainer | grep`) turns the next print into
            # BrokenPipeError — which previously aborted the preemption
            # snapshot itself. Logging must never outrank checkpointing.
            _raw_log = log

            def log(msg, _raw=_raw_log):  # noqa: F811
                try:
                    _raw(msg)
                except OSError:
                    pass

        stop = {"flag": False}
        old_handlers = {}
        if handle_signals:

            def _on_signal(signum, frame):
                stop["flag"] = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    old_handlers[sig] = signal.signal(sig, _on_signal)
                except ValueError:  # not in main thread
                    handle_signals = False
                    old_handlers.clear()
                    break

        timer = Timer()
        metrics = None
        it = start_iter
        last_snap = -1
        # double-buffered device prefetch: ship batch i+1 to the device
        # (async jax.device_put) while step i computes, overlapping H2D
        # transfer with compute — the reference overlaps via its FIFOQueue
        # enqueue thread (lib/fcn/train.py:383-436). Only on a single-device
        # mesh: multi-device batches carry explicit shardings inside the jit
        # and an uncommitted device-0 copy would force a reshard.
        prefetch_dev = self.mesh.devices.size == 1
        ship = jax.device_put if prefetch_dev else (lambda b: b)
        batch_dev = None
        if start_iter < max_iters:
            batch_dev = ship(next(data_iter))
        try:
            for it in range(start_iter, max_iters):
                batch = batch_dev
                if it + 1 < max_iters:
                    batch_dev = ship(next(data_iter))
                if self.vis_hook is not None:
                    self.vis_hook(it + 1, batch)
                self.rng, sub = jax.random.split(self.rng)
                timer.tic()
                state, metrics = self.step_fn(state, batch, sub)
                if (it + 1) % self.display == 0 and log is not None:
                    m = {k: float(v) for k, v in metrics.items()}
                    timer.toc(average=False)
                    log(
                        f"iter {it + 1}/{max_iters} "
                        + " ".join(f"{k}: {v:.4f}" for k, v in sorted(m.items()))
                        + f" ({timer.diff:.3f}s/{self.display}it)"
                    )
                    if self.metrics_logger is not None:
                        m["sec_per_iter"] = timer.diff / self.display
                        self.metrics_logger.log(it + 1, m)
                    timer.tic()
                if self.output_dir and (it + 1) % self.snapshot_iters == 0:
                    self.snapshot(state, it + 1)
                    last_snap = it + 1
                if stop["flag"]:
                    if log:
                        log(f"signal received: snapshotting at iteration {it + 1}")
                    if self.output_dir and last_snap != it + 1:
                        self.snapshot(state, it + 1)
                    break
            else:
                # final snapshot when the run didn't end on a periodic one
                if self.output_dir and self.snapshot_final and last_snap != max_iters:
                    self.snapshot(state, max_iters)
        finally:
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        return state, metrics

    def snapshot(self, state, it: int):
        from posecnn_tpu.core.checkpoint import save_checkpoint

        save_checkpoint(
            self.output_dir, state, step=it, prefix=self.snapshot_prefix,
            include_opt_state=self.snapshot_opt_state,
            fmt=self.snapshot_format,
        )


def make_video_train_step(video_cfg, hp: TrainHParams, mesh: Mesh, donate: bool = False):
    """Train step for the multi-frame GRU model (lib/fcn/train.py:438-453
    loss over NUM_STEPS frames; SolverWrapper.train_model path).

    batch: dict with (T,B,...) arrays data / gt_label_2d / depth / meta_data.
    """
    from posecnn_tpu.models.video import video_forward
    from posecnn_tpu.ops.losses import loss_cross_entropy_single_frame

    tx = make_optimizer(hp)
    sched = lr_schedule(hp)

    def losses_fn(params, batch):
        outs, _ = video_forward(
            params, video_cfg, batch["data"], batch["depth"], batch["meta_data"]
        )
        T = batch["data"].shape[0]
        num_classes = outs["prob"].shape[-1]
        loss = 0.0
        for t in range(T):
            labels = jax.nn.one_hot(batch["gt_label_2d"][t], num_classes)
            loss = loss + loss_cross_entropy_single_frame(outs["prob"][t], labels)
        loss = loss / T
        reg = regularization_loss(params, hp.weight_reg)
        return loss + reg, {"loss": loss + reg, "loss_cls": loss, "loss_regu": reg}

    def step_fn(state, batch):
        params, opt_state, step = state
        (loss, metrics), grads = jax.value_and_grad(losses_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, scale_updates(updates, sched(step)))
        metrics["lr"] = sched(step)
        return (params, opt_state, step + 1), metrics

    repl = replicated(mesh)
    bsh = NamedSharding(mesh, P(None, DATA_AXIS))  # (T, B, ...) shard over B
    multi_device = mesh.devices.size > 1  # see make_train_step

    def jitted(state, batch):
        if not multi_device:
            f = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
            return f(state, batch)
        shardings = {k: bsh for k in batch}
        f = jax.jit(
            step_fn,
            in_shardings=((repl, repl, repl), shardings),
            out_shardings=((repl, repl, repl), repl),
            donate_argnums=(0,) if donate else (),
        )
        return f(state, batch)

    return jitted


# ------------------------------------------------------------- detection path


def det_batch_from_frame(frame, max_gt: int = 24):
    """Build the single-image detection batch (data, gt_boxes, poses) the
    reference assembles in gt_synthesize_layer for vgg16_det. GT boxes come
    from per-class label extents (the synthetic/real frames carry masks)."""
    import numpy as np

    from posecnn_tpu.data.minibatch import pose_rows

    label = frame.label
    boxes = np.zeros((max_gt, 5), np.float32)
    k = 0
    for c in np.unique(label):
        if c <= 0 or k >= max_gt:
            continue
        ys, xs = np.nonzero(label == c)
        if len(xs) < 10:
            continue
        boxes[k] = [xs.min(), ys.min(), xs.max(), ys.max(), c]
        k += 1
    poses = np.zeros((max_gt, 13), np.float32)
    rows = pose_rows(0, frame)
    poses[: min(len(rows), max_gt)] = rows[:max_gt]
    return {
        "data": frame.color[None].astype(np.uint8),
        "gt_boxes": boxes,
        "poses": poses,
    }


def make_det_train_step(det_cfg, hp: TrainHParams, points, symmetry, donate: bool = False):
    """Jitted Faster-R-CNN-style train step (train_net_det,
    lib/fcn/train.py:592-652): RPN cls/bbox + RCNN cls/bbox + ADD pose loss.

    batch: data (1,H,W,3) uint8/f32, gt_boxes (G,5) [x1,y1,x2,y2,cls]
    zero-padded, poses (G,13).
    """
    from posecnn_tpu.models.detection import vgg16_det_forward

    # Coerce host constants once: numpy `points[tracer]` inside the jitted
    # step would call ndarray.__array__ on a tracer (train_net.py passes
    # numpy; tests pass jnp — accept both).
    points = jnp.asarray(points, jnp.float32)
    symmetry = jnp.asarray(symmetry, jnp.float32)

    tx = make_optimizer(hp)
    sched = lr_schedule(hp)

    def losses_fn(params, batch, rng):
        data = batch["data"]
        if data.dtype == jnp.uint8:
            means = jnp.asarray(hp.pixel_means, jnp.float32).reshape(1, 1, 1, 3)
            data = data.astype(jnp.float32) - means
        out = vgg16_det_forward(
            params, det_cfg, data, gt_boxes=batch["gt_boxes"],
            gt_poses=batch["poses"], rng=rng,
        )
        losses = {}
        # RPN class loss over labels != -1 (train.py:598-603)
        logits = out["rpn_cls_score"].reshape(-1, 2)
        rpn_labels = out["rpn_labels"].reshape(-1)
        keep = rpn_labels != -1
        lab_safe = jnp.where(keep, rpn_labels, 0)
        ce = -jax.nn.log_softmax(logits, axis=-1)[jnp.arange(logits.shape[0]), lab_safe]
        loss_rpn_cls = jnp.sum(jnp.where(keep, ce, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
        losses["loss_rpn_cls"] = loss_rpn_cls
        # RPN bbox loss: sigma 3, summed over anchors (train.py:605-611)
        loss_rpn_box = smooth_l1_loss(
            out["rpn_bbox_pred"].reshape(1, -1, 4),
            out["rpn_bbox_targets"].reshape(1, -1, 4),
            out["rpn_bbox_inside_weights"].reshape(1, -1, 4),
            out["rpn_bbox_outside_weights"].reshape(1, -1, 4),
            sigma=3.0, dim=(1, 2),
        )
        losses["loss_rpn_box"] = loss_rpn_box
        # RCNN class + bbox (train.py:613-623)
        loss_cls = sparse_softmax_cross_entropy(out["cls_score"], out["labels"].astype(jnp.int32))
        losses["loss_cls"] = loss_cls
        loss_box = smooth_l1_loss(
            out["bbox_pred"], out["bbox_targets"],
            out["bbox_inside_weights"], out["bbox_outside_weights"], dim=(1,),
        )
        losses["loss_box"] = loss_box
        # pose loss (train.py:626)
        loss_pose = hp.pose_w * average_distance_loss(
            out["poses_pred"], out["poses_target"], out["poses_weight"],
            points, symmetry, hp.margin,
        )
        losses["loss_pose"] = loss_pose
        reg = regularization_loss(params, hp.weight_reg)
        losses["loss_regu"] = reg
        loss = loss_rpn_cls + loss_rpn_box + loss_cls + loss_box + loss_pose + reg
        losses["loss"] = loss
        return loss, losses

    def step_fn(state, batch, rng):
        params, opt_state, step = state
        (loss, losses), grads = jax.value_and_grad(losses_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, scale_updates(updates, sched(step)))
        losses["lr"] = sched(step)
        return (params, opt_state, step + 1), losses

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def create_det_train_state(det_cfg, hp: TrainHParams, rng: jax.Array):
    from posecnn_tpu.models.detection import init_vgg16_det_params

    params = init_vgg16_det_params(rng, det_cfg)
    tx = make_optimizer(hp)
    return (params, tx.init(params), jnp.asarray(0, jnp.int32))
