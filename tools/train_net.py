#!/usr/bin/env python
"""Train a PoseCNN network (mirrors reference tools/train_net.py flags)."""

from __future__ import annotations

import _init_paths  # noqa: F401  (repo-root import bootstrap)

import argparse
import os
import pprint
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Train a posecnn_tpu network")
    parser.add_argument("--device", default="tpu", help="device to use (tpu/cpu)")
    parser.add_argument("--device_id", type=int, default=0)
    parser.add_argument("--iters", dest="max_iters", type=int, default=40000)
    parser.add_argument("--weights", dest="pretrained_model", default=None, help="vgg16.npy init weights")
    parser.add_argument("--ckpt", dest="pretrained_ckpt", default=None, help="TF1/orbax checkpoint")
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--imdb", dest="imdb_name", default="toy_train")
    parser.add_argument("--network", dest="network_name", default="vgg16_convs")
    parser.add_argument("--rand", action="store_true", help="randomize (do not fix seed)")
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the latest snapshot in the output dir",
    )
    parser.add_argument("--output", default=None, help="output dir override")
    parser.add_argument(
        "--vis", action="store_true",
        help="render assembled minibatches (TRAIN.VISUALIZE) under the output dir",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    import jax

    if args.device and args.device != "tpu":
        # JAX_PLATFORMS env is ignored in some environments; the config API
        # works when set before backend initialization
        jax.config.update("jax_platforms", args.device)

    # multi-host: joins the global runtime when POSECNN_COORDINATOR /
    # NUM_PROCESSES / PROCESS_ID (or TPU pod metadata) are present; no-op
    # for single-process runs
    from posecnn_tpu.parallel.launch import initialize as distributed_initialize

    distributed_initialize()

    from posecnn_tpu.core.config import cfg, cfg_from_file, get_output_dir
    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.layer import GtSynthesizeLayer, prefetch
    from posecnn_tpu.data.minibatch import MinibatchConfig
    from posecnn_tpu.engine.train import Solver, TrainHParams, create_train_state
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    from posecnn_tpu.core.config import apply_debug_flags

    apply_debug_flags(cfg)
    if not args.rand:
        np.random.seed(cfg.RNG_SEED)
    print("Using config:")
    pprint.pprint(cfg)

    imdb = get_imdb(args.imdb_name)
    if cfg.TRAIN.USE_FLIPPED:
        # reference get_training_roidb (lib/fcn/train.py:373-380): double the
        # roidb with horizontally flipped entries
        try:
            imdb.append_flipped_images()
            print("appended flipped images")
        except NotImplementedError:
            print("dataset has no roidb; USE_FLIPPED ignored")
    print(f"Loaded dataset `{imdb.name}`: {imdb.num_images} images")

    if cfg.NETWORK == "VGG16DET" or args.network_name == "vgg16_det":
        train_det(args, cfg, imdb)
        return

    # segmentation-only variants route through the network factory (the
    # reference get_network serves every variant, lib/networks/factory.py:47-51)
    if cfg.NETWORK in ("RESNET50", "FCN8VGG") or args.network_name in ("resnet50", "fcn8_vgg"):
        name = "resnet50" if (cfg.NETWORK == "RESNET50" or args.network_name == "resnet50") else "fcn8_vgg"
        train_segmentation(args, cfg, imdb, name)
        return

    # vgg16_full: dense all-scale FCN variant; same endpoint contract, its
    # own forward fn + the hard-coded 0.7 hard-label gate (vgg16_full.py:131)
    forward_fn = None
    ce_threshold = None
    if cfg.NETWORK == "VGG16FULL" or args.network_name == "vgg16_full":
        from posecnn_tpu.models.posecnn_full import (
            init_posecnn_full_params,
            posecnn_full_forward,
        )

        forward_fn = posecnn_full_forward
        ce_threshold = 0.7

    model_cfg = PoseCNNConfig(
        num_classes=imdb.num_classes,
        num_units=cfg.TRAIN.NUM_UNITS,
        input_format=cfg.INPUT if cfg.INPUT != "COLOR" else "COLOR",
        vertex_reg=cfg.TRAIN.VERTEX_REG_2D or cfg.TRAIN.VERTEX_REG_3D,
        vertex_reg_3d=cfg.TRAIN.VERTEX_REG_3D,
        # the quaternion branch hangs off hough voting, which only exists in
        # the 2D center-direction mode (vgg16_convs.py gating)
        pose_reg=cfg.TRAIN.POSE_REG and not cfg.TRAIN.VERTEX_REG_3D,
        adaptation=cfg.TRAIN.ADAPT,
        threshold_label=cfg.TRAIN.THRESHOLD_LABEL,
        vote_threshold=cfg.TRAIN.VOTING_THRESHOLD,
        is_train=True,
        keep_prob=0.5,
        hough_class_slots=cfg.TPU.HOUGH_CLASS_SLOTS,
        hough_max_samples=cfg.TPU.HOUGH_MAX_SAMPLES,
        hough_center_stride=cfg.TPU.HOUGH_CENTER_STRIDE,
        hough_sampler=cfg.TPU.HOUGH_SAMPLER,
        hough_pixel_stride=cfg.TPU.HOUGH_PIXEL_STRIDE,
        skip_pixels=cfg.TPU.HOUGH_SKIP_PIXELS,
        use_crop_pool=cfg.TPU.USE_CROP_POOL,
        hough_from_gt=cfg.TPU.HOUGH_FROM_GT,
        hough_gt_mix=cfg.TPU.HOUGH_GT_MIX,
    )
    hp = TrainHParams(
        learning_rate=cfg.TRAIN.LEARNING_RATE,
        momentum=cfg.TRAIN.MOMENTUM,
        gamma=cfg.TRAIN.GAMMA,
        stepsize=cfg.TRAIN.STEPSIZE,
        weight_reg=cfg.TRAIN.WEIGHT_REG,
        vertex_w=cfg.TRAIN.VERTEX_W,
        pose_w=cfg.TRAIN.POSE_W,
        adapt_weight=cfg.TRAIN.ADAPT_WEIGHT,
        clip_grad_norm=cfg.TRAIN.GRAD_CLIP,
        margin=cfg.TRAIN.POSE_MARGIN,
        pose_norm_valid=cfg.TRAIN.POSE_NORM_VALID,
        matching_w=1.0 if cfg.TRAIN.MATCHING else 0.0,
        quat_w=cfg.TPU.QUAT_AUX_W,
        vertex_z_obj_norm=cfg.TPU.VERTEX_Z_OBJ_NORM,
    )
    mcfg = MinibatchConfig(
        num_classes=imdb.num_classes,
        pixel_means=cfg.pixel_means(),
        # TRAIN.SCALES_BASE input rescale (reference samples uniformly over
        # the tuple per frame via _get_image_blob; every shipped reference
        # config pins a single scale, so the first entry is used)
        scale=float(cfg.TRAIN.SCALES_BASE[0]),
        chromatic=cfg.TRAIN.CHROMATIC,
        add_noise=cfg.TRAIN.ADD_NOISE,
        vertex_reg=model_cfg.vertex_reg,
        vertex_reg_3d=cfg.TRAIN.VERTEX_REG_3D,
        vertex_w_inside=cfg.TRAIN.VERTEX_W_INSIDE,
        max_gt=cfg.TPU.MAX_GT,
        device_targets=cfg.TPU.DEVICE_TARGETS,
        input_format=cfg.INPUT,
        gan=cfg.TRAIN.GAN,
    )
    output_dir = args.output or get_output_dir(imdb.name, args.network_name)
    print("Output will be saved to", output_dir)

    # synthetic-frame source for the SYNTHESIZE mix (reference render thread /
    # offline data_syn reader, tools/train_net.py:155-258, minibatch.py:121-154)
    syn_frames = None
    if cfg.TRAIN.SYNTHESIZE:
        if cfg.TRAIN.SYN_ONLINE:
            from posecnn_tpu.data.synthetic import build_ycb_synthesizer

            pose_bank = None
            if cfg.TRAIN.SYN_SAMPLE_POSE:
                # per-class pose bank (the reference reads poses.txt files,
                # synthesize.cpp loadPoses); one combined bank here
                bank_file = os.path.join(
                    getattr(imdb, "_lov_path", ""), "poses.txt"
                )
                if os.path.exists(bank_file):
                    pose_bank = np.loadtxt(bank_file).reshape(-1, 4)
            synth = build_ycb_synthesizer(
                imdb, width=cfg.TRAIN.SYN_WIDTH, height=cfg.TRAIN.SYN_HEIGHT,
                t_near=cfg.TRAIN.SYN_TNEAR, t_far=cfg.TRAIN.SYN_TFAR,
                pose_bank=pose_bank,
            )
            syn_frames = lambda i, rng: synth.render_scene(rng)
        else:
            from posecnn_tpu.data.synthetic import OfflineSynReader

            reader = OfflineSynReader(cfg.TRAIN.SYNROOT, num=cfg.TRAIN.SYNNUM)
            syn_frames = lambda i, rng: reader.load_frame(
                (cfg.TRAIN.SYNITER + rng.randint(reader.num)) % reader.num
            )

    # domain-adaptation frames: real unlabeled images from ADAPT_ROOT
    # (label blob becomes -1; reference layer.py adaptation stream)
    adapt_frames = None
    if cfg.TRAIN.ADAPT and cfg.TRAIN.ADAPT_ROOT:
        import glob as _glob

        import cv2 as _cv2

        from posecnn_tpu.data.minibatch import Frame as _Frame

        adapt_paths = sorted(
            _glob.glob(os.path.join(cfg.TRAIN.ADAPT_ROOT, "*.png"))
            + _glob.glob(os.path.join(cfg.TRAIN.ADAPT_ROOT, "*.jpg"))
        )[: cfg.TRAIN.ADAPT_NUM]

        def adapt_frames(i, rng, _paths=adapt_paths):
            im = _cv2.imread(_paths[rng.randint(len(_paths))], _cv2.IMREAD_COLOR)
            h, w = im.shape[:2]
            return _Frame(
                color=im, label=np.zeros((h, w), np.int32),
                cls_indexes=np.zeros(0, np.float32),
                poses=np.zeros((3, 4, 0), np.float32),
                center=np.zeros((0, 2), np.float32),
                intrinsic_matrix=np.eye(3),
                is_adaptation=True,
            )

        if not adapt_paths:
            adapt_frames = None

    backgrounds = None
    if cfg.TRAIN.SYNTHESIZE:
        from posecnn_tpu.data.layer import build_background_paths

        backgrounds = build_background_paths(
            os.environ.get("POSECNN_DATA", "data"), cfg.INPUT
        )
        if backgrounds:
            print(f"{len(backgrounds)} background images")

    layer = GtSynthesizeLayer(
        imdb, mcfg,
        ims_per_batch=cfg.TRAIN.IMS_PER_BATCH,
        synthesize=cfg.TRAIN.SYNTHESIZE,
        syn_ratio=cfg.TRAIN.SYN_RATIO,
        syn_frames=syn_frames,
        adapt=cfg.TRAIN.ADAPT and adapt_frames is not None,
        adapt_ratio=cfg.TRAIN.ADAPT_RATIO,
        adapt_frames=adapt_frames,
        backgrounds=backgrounds,
        seed=cfg.RNG_SEED,
    )
    # the ADD/ADD-S loss trains on RESCALED model points (weight
    # max(10, 2/ext_max), x4 for symmetric classes — minibatch.py:49-63);
    # feeding raw meter-scale clouds shrinks pose gradients ~400x and the
    # quaternion head never trains. Evaluation always uses raw points.
    from posecnn_tpu.data.minibatch import rescale_points

    loss_points = rescale_points(
        np.asarray(layer.dataset._points_all, np.float32),
        np.asarray(layer.dataset._extents),
        np.asarray(layer.dataset._symmetry),
        mcfg.is_symmetric,
    )
    vis_hook = None
    if args.vis or cfg.TRAIN.VISUALIZE:
        from posecnn_tpu.engine.visualize import MinibatchVisualizer

        vis_hook = MinibatchVisualizer(
            output_dir,
            num_classes=cfg.TRAIN.NUM_CLASSES,
            extents=np.asarray(layer.dataset._extents),
            pixel_means=mcfg.pixel_means,
        )
    solver = Solver(
        model_cfg, hp,
        vis_hook=vis_hook,
        points=loss_points,
        # raw meter-scale clouds for the render-and-compare matching loss
        # (projects through real intrinsics; rescaled points would miss the ROI)
        points_raw=np.asarray(layer.dataset._points_all, np.float32),
        symmetry=layer.dataset._symmetry,
        extents=layer.dataset._extents,
        output_dir=output_dir,
        snapshot_iters=cfg.TRAIN.SNAPSHOT_ITERS,
        snapshot_prefix=cfg.TRAIN.SNAPSHOT_PREFIX,
        display=cfg.TRAIN.DISPLAY,
        seed=cfg.RNG_SEED,
        snapshot_opt_state=cfg.TPU.CHECKPOINT_OPT_STATE,
        forward_fn=forward_fn,
        ce_threshold=ce_threshold,
        snapshot_format=cfg.TPU.CHECKPOINT_FORMAT,
        snapshot_final=cfg.TRAIN.SNAPSHOT_FINAL,
    )
    if forward_fn is not None:
        import optax

        from posecnn_tpu.engine.train import make_optimizer

        params0 = init_posecnn_full_params(jax.random.PRNGKey(cfg.RNG_SEED), model_cfg)
        state = (params0, make_optimizer(hp).init(params0), jax.numpy.asarray(0, jax.numpy.int32))
    else:
        state = create_train_state(model_cfg, hp, jax.random.PRNGKey(cfg.RNG_SEED))
    if args.pretrained_model:
        from posecnn_tpu.core.checkpoint import load_vgg16_npy

        params, opt_state, step = state
        state = (load_vgg16_npy(args.pretrained_model, params, log=print), opt_state, step)
    if args.pretrained_ckpt:
        from posecnn_tpu.core.checkpoint import load_tf1_checkpoint

        params, opt_state, step = state
        state = (load_tf1_checkpoint(args.pretrained_ckpt, params, log=print), opt_state, step)

    # resume before bank construction: the bank refresher's seed stream
    # folds in the resume iteration so kill+resume cycles keep advancing
    # through fresh scenes instead of replaying the first chunks
    start_iter = 0
    if args.resume:
        state, start_iter = solver.resume(state)

    if cfg.TPU.DEVICE_BANK:
        # device-resident dataset: stage every frame into HBM once and let
        # the jit step sample/assemble/augment on device (zero host work
        # per iteration — the single-core host pipeline otherwise caps the
        # step rate ~7x below the device step time)
        import itertools

        from posecnn_tpu.data.device_bank import bank_nbytes, build_bank
        from posecnn_tpu.engine.train import make_bank_train_step

        # the bank stores raw unscaled COLOR frames and builds meta_data at
        # scale 1.0, so INPUT modes needing depth/normal blobs or non-unit
        # SCALES_BASE would silently train on the wrong input via this path
        assert not (cfg.TRAIN.SYNTHESIZE or cfg.TRAIN.ADAPT or
                    cfg.TRAIN.USE_FLIPPED or cfg.TRAIN.VERTEX_REG_3D or
                    forward_fn is not None) and cfg.INPUT == "COLOR" and \
            float(cfg.TRAIN.SCALES_BASE[0]) == 1.0 and \
            len(cfg.TRAIN.SCALES_BASE) == 1, \
            "TPU.DEVICE_BANK supports the fixed single-frame COLOR flagship path"
        bank_np = build_bank(imdb, mcfg, log=print)
        print(f"device bank: {bank_np['data'].shape[0]} frames, "
              f"{bank_nbytes(bank_np) / 1e9:.2f} GB -> HBM")
        bank = jax.device_put(bank_np)
        del bank_np
        solver.step_fn = make_bank_train_step(
            model_cfg, hp,
            solver.points, solver.symmetry, solver.extents,
            batch_size=cfg.TRAIN.IMS_PER_BATCH,
            max_gt=cfg.TPU.MAX_GT,
            chromatic=cfg.TRAIN.CHROMATIC,
            add_noise=cfg.TRAIN.ADD_NOISE,
            points_raw=(jax.numpy.asarray(layer.dataset._points_all,
                                          jax.numpy.float32)
                        if cfg.TRAIN.MATCHING else None),
        )
        if cfg.TPU.BANK_REFRESH:
            # never-reuse-a-frame training (the reference renders a fresh
            # scene per iteration): a daemon thread streams new renders
            # into the HBM bank while the device steps
            from posecnn_tpu.data.bank_refresh import (
                BankRefresher, refresh_synthesizer, refreshing_bank_iter,
            )

            refresher = BankRefresher(
                refresh_synthesizer(imdb),
                g_max=bank["gt_centers"].shape[1],
                chunk_size=cfg.TPU.BANK_REFRESH_CHUNK,
                seed_offset=start_iter,
                throttle_sec=cfg.TPU.BANK_REFRESH_THROTTLE,
                # sidecar keeps the seed high-water mark across supervisor
                # kill+resume cycles (start_iter alone can replay seeds when
                # a child wedged before iterations advanced)
                counter_path=os.path.join(output_dir, "bank_refresh_counter.txt"),
            )
            refresher.start()
            print(f"bank refresh: streaming fresh scenes in chunks of "
                  f"{refresher.chunk_size} (seed offset {refresher._counter})")
            data_iter = refreshing_bank_iter(bank, refresher, log=print)
        else:
            data_iter = itertools.repeat(bank)
    else:
        data_iter = prefetch(iter(layer), depth=cfg.TPU.PREFETCH)
    solver.train(data_iter, state, args.max_iters, start_iter=start_iter)
    print("done solving")


def train_segmentation(args, cfg, imdb, network_name: str):
    """Segmentation-only variant training (RESNET50 / FCN8VGG): the reference
    trains these through train_net's plain cross-entropy branch
    (lib/fcn/train.py:482-488)."""
    import jax

    from posecnn_tpu.core.config import get_output_dir
    from posecnn_tpu.data.layer import GtSynthesizeLayer, prefetch
    from posecnn_tpu.data.minibatch import MinibatchConfig
    from posecnn_tpu.engine.train import TrainHParams, make_optimizer, make_seg_train_step
    from posecnn_tpu.models.factory import get_network

    init_fn, forward_fn = get_network(network_name)
    hp = TrainHParams(
        learning_rate=cfg.TRAIN.LEARNING_RATE, momentum=cfg.TRAIN.MOMENTUM,
        gamma=cfg.TRAIN.GAMMA, stepsize=cfg.TRAIN.STEPSIZE,
        weight_reg=cfg.TRAIN.WEIGHT_REG, clip_grad_norm=cfg.TRAIN.GRAD_CLIP,
    )
    C = imdb.num_classes
    if network_name == "fcn8_vgg":
        apply_fn = lambda p, d, rng: forward_fn(p, d, C, keep_prob=0.5, rng=rng)
    else:
        apply_fn = lambda p, d, rng: forward_fn(p, d, C)
    mcfg = MinibatchConfig(
        num_classes=C, pixel_means=cfg.pixel_means(),
        chromatic=cfg.TRAIN.CHROMATIC, add_noise=cfg.TRAIN.ADD_NOISE,
        vertex_reg=False, device_targets=cfg.TPU.DEVICE_TARGETS,
        input_format=cfg.INPUT,
    )
    layer = GtSynthesizeLayer(
        imdb, mcfg, ims_per_batch=cfg.TRAIN.IMS_PER_BATCH, seed=cfg.RNG_SEED
    )
    params = init_fn(jax.random.PRNGKey(cfg.RNG_SEED), C)
    state = (params, make_optimizer(hp).init(params), jax.numpy.asarray(0, jax.numpy.int32))
    step = make_seg_train_step(apply_fn, hp, C)
    output_dir = args.output or get_output_dir(imdb.name, network_name)
    data_iter = prefetch(iter(layer), depth=cfg.TPU.PREFETCH)
    import time

    from posecnn_tpu.core.checkpoint import save_checkpoint

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    t0 = time.time()
    for it in range(args.max_iters):
        batch = next(data_iter)
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        if (it + 1) % cfg.TRAIN.DISPLAY == 0:
            vals = {k: float(v) for k, v in m.items()}
            print(
                f"iter {it + 1}/{args.max_iters} "
                + " ".join(f"{k}: {v:.4f}" for k, v in sorted(vals.items()))
                + f" ({time.time() - t0:.1f}s)"
            )
            t0 = time.time()
        if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0 or it + 1 == args.max_iters:
            save_checkpoint(output_dir, state, it + 1, prefix=cfg.TRAIN.SNAPSHOT_PREFIX,
                            include_opt_state=cfg.TPU.CHECKPOINT_OPT_STATE)
    print(f"done solving ({network_name})")


def train_det(args, cfg, imdb):
    """Detection-variant training (reference train_net_det)."""
    import time

    import jax
    import numpy as np

    from posecnn_tpu.core.checkpoint import save_checkpoint
    from posecnn_tpu.core.config import get_output_dir
    from posecnn_tpu.engine.train import (
        TrainHParams, create_det_train_state, det_batch_from_frame, make_det_train_step,
    )
    from posecnn_tpu.models.detection import DetConfig

    det_cfg = DetConfig(num_classes=imdb.num_classes, is_train=True)
    hp = TrainHParams(
        learning_rate=cfg.TRAIN.LEARNING_RATE, momentum=cfg.TRAIN.MOMENTUM,
        gamma=cfg.TRAIN.GAMMA, stepsize=cfg.TRAIN.STEPSIZE,
        weight_reg=cfg.TRAIN.WEIGHT_REG, pose_w=cfg.TRAIN.POSE_W,
    )
    from posecnn_tpu.data.minibatch import rescale_points

    points = np.stack([np.asarray(p) for p in imdb._points_all]) \
        if isinstance(imdb._points_all, list) else np.asarray(imdb._points_all)
    # rescaled points for the ADD loss (minibatch.py:49-63), as in the
    # segmentation path above
    points = rescale_points(
        points.astype(np.float32), np.asarray(imdb._extents),
        np.asarray(imdb._symmetry, np.float32),
    )
    state = create_det_train_state(det_cfg, hp, jax.random.PRNGKey(cfg.RNG_SEED))
    step = make_det_train_step(det_cfg, hp, points.astype(np.float32),
                               np.asarray(imdb._symmetry, np.float32))
    output_dir = args.output or get_output_dir(imdb.name, "vgg16_det")
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    order = np.random.RandomState(cfg.RNG_SEED).permutation(imdb.num_images)
    t0 = time.time()
    for it in range(args.max_iters):
        frame = imdb.load_frame(int(order[it % imdb.num_images]))
        batch = det_batch_from_frame(frame, max_gt=cfg.TPU.MAX_GT)
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        if (it + 1) % cfg.TRAIN.DISPLAY == 0:
            vals = {k: float(v) for k, v in m.items()}
            print(
                f"iter {it + 1}/{args.max_iters} "
                + " ".join(f"{k}: {v:.4f}" for k, v in sorted(vals.items()))
                + f" ({time.time() - t0:.1f}s)"
            )
            t0 = time.time()
        if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0 or it + 1 == args.max_iters:
            save_checkpoint(output_dir, state, it + 1, prefix=cfg.TRAIN.SNAPSHOT_PREFIX,
                            include_opt_state=cfg.TPU.CHECKPOINT_OPT_STATE)
    print("done solving (det)")


if __name__ == "__main__":
    main()
