"""Host-side minibatch assembly (NumPy/cv2), fixed device shapes.

Behavioral rewrite of `lib/gt_synthesize_layer/minibatch.py`:
  * image blob: BGR, optional chromatic jitter + gaussian/motion-blur noise,
    PIXEL_MEANS subtraction before resize (minibatch.py:180-239);
  * synthetic frames composited over random backgrounds (:121-154);
  * label blob (int32 class ids; -1 for adaptation frames, :517-525);
  * vertex targets: per-pixel unit direction to the object center + log z in
    the 3 channels of the pixel's class (:543-602);
  * pose blob rows (idx, cls, 4 zeros, quat wxyz, T) (:439-451) — padded to a
    fixed MAX_GT for static device shapes (the reference's was dynamic);
  * 48-float meta_data: K*scale and K^-1 (:468-492);
  * symmetric-point rescaling trick for the ADD loss point blob (:49-63).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import cv2
import numpy as np

from posecnn_tpu.utils.blob import add_noise, chromatic_transform, pad_im
from posecnn_tpu.utils.quaternion_np import mat2quat


@dataclass
class Frame:
    """One annotated frame, the unit consumed by the minibatch builder."""

    color: np.ndarray                 # (H,W,3) uint8 BGR
    label: np.ndarray                 # (H,W) int class ids
    cls_indexes: np.ndarray           # (N,) class ids present
    poses: np.ndarray                 # (3,4,N) [R|t] per instance
    center: np.ndarray                # (N,2) projected object centers (x,y)
    intrinsic_matrix: np.ndarray      # (3,3)
    depth: Optional[np.ndarray] = None       # (H,W) raw depth
    factor_depth: float = 1000.0
    is_synthetic: bool = False        # composite over a random background
    is_adaptation: bool = False       # no labels: label blob = -1
    # instance mask for multi-instance frames: pixel value = instance slot
    # j+1 for poses[:, :, j] (the reference reads an analogous mask image,
    # minibatch.py:425-432)
    mask: Optional[np.ndarray] = None
    flipped: bool = False
    # per-pixel 3D object coordinates in the model frame (H,W,3), required
    # for VERTEX_REG_3D targets (reference meta_data['vertmap'])
    vertmap: Optional[np.ndarray] = None


@dataclass
class MinibatchConfig:
    num_classes: int = 22
    pixel_means: np.ndarray = field(
        default_factory=lambda: np.array([[[102.9801, 115.9465, 122.7717]]])
    )
    chromatic: bool = True
    add_noise: bool = False
    vertex_reg: bool = True
    # 3D object-coordinate targets instead of 2D center voting (VERTEX_REG_3D;
    # requires Frame.vertmap)
    vertex_reg_3d: bool = False
    vertex_w_inside: float = 10.0
    max_gt: int = 24
    scale: float = 1.0
    is_symmetric: bool = True
    # COLOR | DEPTH | RGBD | NORMAL (reference cfg.INPUT, _get_image_blob
    # minibatch.py:155-239): DEPTH/NORMAL replace the color input with the
    # normalized-depth / normal-map image; RGBD additionally ships `data_p`
    # for the dual tower
    input_format: str = "COLOR"
    # TRAIN.GAN: additionally ship the [-1,1]-normalized image blob the GAN
    # models consume (gt_single_data_layer/minibatch.py:102-106)
    gan: bool = False
    # TPU fast path: ship uint8 frames + a small (G,4) GT-center table and
    # build the mean-subtracted input and the (B,H,W,3C) vertex targets
    # inside the train step's jit graph (ops/vertex_targets.py). This host
    # otherwise spends seconds per batch on the 162 MB target blob.
    device_targets: bool = False


def scale_vertmap(vertmap: np.ndarray, index, extents: np.ndarray) -> np.ndarray:
    """Normalize 3D object coordinates to [0,1] per axis by the class extent
    (reference `_scale_vertmap`, minibatch.py:605-617). `index` = (ys, xs)."""
    out = np.zeros((len(index[0]), 3), dtype=np.float32)
    for i in range(3):
        vmin, vmax = -extents[i] / 2.0, extents[i] / 2.0
        if vmax - vmin > 0:
            a = 1.0 / (vmax - vmin)
            b = -vmin / (vmax - vmin)
        else:
            a = b = 0.0
        out[:, i] = a * vertmap[index[0], index[1], i] + b
    return out


def unscale_vertmap(scaled: np.ndarray, cls_index: int, extents: np.ndarray) -> np.ndarray:
    """Invert `scale_vertmap` for one class: [0,1]^3 -> model coordinates."""
    out = np.zeros_like(scaled, dtype=np.float32)
    for i in range(3):
        vmin, vmax = -extents[cls_index, i] / 2.0, extents[cls_index, i] / 2.0
        out[..., i] = scaled[..., i] * (vmax - vmin) + vmin
    return out


def _write_targets_2d(targets, weights, y, x, cx, cy, z, cls, w_inside):
    c = np.array([[cx], [cy]], dtype=np.float32)
    R = np.tile(c, (1, len(x))) - np.vstack((x, y))
    N = np.linalg.norm(R, axis=0) + 1e-10
    R = R / np.tile(N, (2, 1))
    targets[y, x, 3 * cls + 0] = R[0, :]
    targets[y, x, 3 * cls + 1] = R[1, :]
    targets[y, x, 3 * cls + 2] = math.log(z)
    weights[y, x, 3 * cls : 3 * cls + 3] = w_inside


def generate_vertex_targets(
    im_label: np.ndarray,
    cls_indexes: np.ndarray,
    centers: np.ndarray,
    poses: np.ndarray,
    num_classes: int,
    vertex_weights_value: float = 10.0,
    mask: Optional[np.ndarray] = None,
    vertmap: Optional[np.ndarray] = None,
    extents: Optional[np.ndarray] = None,
    vertex_reg_3d: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel regression targets (minibatch.py:543-602).

    2D mode: unit direction to the instance's projected center + log z in the
    3 channels of the pixel's class. 3D mode: extent-normalized object
    coordinates from `vertmap` (`_scale_vertmap`, minibatch.py:596-597).

    Multi-instance (several objects of one class): pixels are routed to their
    own instance via `mask` (pixel value = instance slot + 1, the reference's
    mask image, minibatch.py:549-574); without a mask the first instance of
    each class wins (reference single-instance branch).
    """
    height, width = im_label.shape
    targets = np.zeros((height, width, 3 * num_classes), dtype=np.float32)
    weights = np.zeros((height, width, 3 * num_classes), dtype=np.float32)
    multi = mask is not None and len(np.unique(cls_indexes)) < len(cls_indexes)
    if multi:
        for j in range(len(cls_indexes)):
            cls = int(cls_indexes[j])
            if cls <= 0 or cls >= num_classes:
                continue
            sel = (mask == j + 1) & (im_label == cls)
            y, x = np.where(sel)
            if len(x) == 0:
                continue
            if vertex_reg_3d:
                targets[y, x, 3 * cls : 3 * cls + 3] = scale_vertmap(
                    vertmap, (y, x), extents[cls, :]
                )
                weights[y, x, 3 * cls : 3 * cls + 3] = vertex_weights_value
            else:
                _write_targets_2d(
                    targets, weights, y, x, centers[j, 0], centers[j, 1],
                    poses[2, 3, j], cls, vertex_weights_value,
                )
    else:
        for i in range(1, num_classes):
            y, x = np.where(im_label == i)
            ind = np.where(cls_indexes == i)[0]
            if len(x) > 0 and len(ind) > 0:
                if vertex_reg_3d:
                    targets[y, x, 3 * i : 3 * i + 3] = scale_vertmap(
                        vertmap, (y, x), extents[i, :]
                    )
                    weights[y, x, 3 * i : 3 * i + 3] = vertex_weights_value
                else:
                    _write_targets_2d(
                        targets, weights, y, x, centers[ind[0], 0],
                        centers[ind[0], 1], poses[2, 3, ind[0]], i,
                        vertex_weights_value,
                    )
    return targets, weights


def flip_poses(poses: np.ndarray, K: np.ndarray, width: int) -> np.ndarray:
    """Mirror object poses for a horizontally flipped image
    (reference `_flip_poses`, minibatch.py:528-539): with K1 = K after
    fx -> -fx, cx -> width - cx, the flipped pose is K^-1 K1 [R|t]."""
    K = np.asarray(K, np.float64)
    K1 = K.copy()
    K1[0, 0] = -K1[0, 0]
    K1[0, 2] = width - K1[0, 2]
    A = np.linalg.inv(K) @ K1
    out = poses.copy()
    for j in range(poses.shape[2]):
        out[:, :, j] = A @ poses[:, :, j]
    return out


def scale_frame(fr: Frame, s: float) -> Frame:
    """TRAIN/TEST.SCALES_BASE input rescale (reference _get_image_blob,
    minibatch.py:180-183): color bilinear, label/mask/vertmap nearest, depth
    nearest, centers multiplied by the scale. K is handled by
    build_meta_data(im_scale); 3D poses are resolution-independent."""
    from dataclasses import replace

    def rs(a, interp):
        return cv2.resize(a, None, None, fx=s, fy=s, interpolation=interp)

    label = rs(fr.label.astype(np.int32), cv2.INTER_NEAREST)
    return replace(
        fr,
        color=rs(fr.color, cv2.INTER_LINEAR),
        label=label,
        depth=rs(fr.depth, cv2.INTER_NEAREST) if fr.depth is not None else None,
        mask=rs(fr.mask, cv2.INTER_NEAREST) if fr.mask is not None else None,
        vertmap=rs(fr.vertmap, cv2.INTER_NEAREST) if fr.vertmap is not None else None,
        center=fr.center * s,
    )


def flip_frame(fr: Frame) -> Frame:
    """Apply horizontal-flip augmentation to a frame (image/label/depth/mask/
    vertmap mirrored, centers x -> width - x, poses via `flip_poses`;
    reference minibatch.py:177,347,414-421,495)."""
    from dataclasses import replace

    width = fr.color.shape[1]
    center = fr.center.copy()
    center[:, 0] = width - center[:, 0]
    return replace(
        fr,
        color=np.ascontiguousarray(fr.color[:, ::-1]),
        label=np.ascontiguousarray(fr.label[:, ::-1]),
        depth=np.ascontiguousarray(fr.depth[:, ::-1]) if fr.depth is not None else None,
        mask=np.ascontiguousarray(fr.mask[:, ::-1]) if fr.mask is not None else None,
        vertmap=np.ascontiguousarray(fr.vertmap[:, ::-1]) if fr.vertmap is not None else None,
        center=center,
        poses=flip_poses(fr.poses, fr.intrinsic_matrix, width),
        flipped=False,  # consumed
    )


def depth_input_image(depth: np.ndarray) -> np.ndarray:
    """Depth -> 3-channel uint8-scale image: depth / max * 255, tiled
    (reference minibatch.py:188-190)."""
    d = depth.astype(np.float32)
    m = float(d.max())
    if m > 0:
        d = d / m * 255.0
    return np.tile(d[:, :, None], (1, 1, 3))


def normals_np(depth_m: np.ndarray, K: np.ndarray, depth_cutoff: float = 20.0) -> np.ndarray:
    """Host twin of ops/normals.compute_normals (NumPy; the data-loader
    thread must not dispatch to the accelerator)."""
    h, w = depth_m.shape
    fx, fy, px, py = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = np.arange(w, dtype=np.float32)[None, :]
    y = np.arange(h, dtype=np.float32)[:, None]
    pts = np.stack(
        [(x - px) / fx * depth_m, (y - py) / fy * depth_m, depth_m], axis=-1
    )
    dx = np.gradient(pts, axis=1)
    dy = np.gradient(pts, axis=0)
    n = np.cross(dy, dx)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-8)
    flip = np.sum(n * pts, axis=-1, keepdims=True) > 0
    n = np.where(flip, -n, n)
    valid = (depth_m > 0) & (depth_m < depth_cutoff)
    return np.where(valid[..., None], n, 0.0).astype(np.float32)


def normal_input_image(depth: np.ndarray, factor_depth: float, K: np.ndarray) -> np.ndarray:
    """Depth -> normal-map input image (reference minibatch.py:204-216):
    normals in [-1,1] -> 127.5*n + 127.5, BGR channel order, bilateral
    smoothing."""
    nmap = normals_np(depth.astype(np.float32) / float(factor_depth), K)
    im = (127.5 * nmap + 127.5).astype(np.uint8)
    im = im[:, :, (2, 1, 0)]
    im = cv2.bilateralFilter(im, 9, 75, 75)
    return im.astype(np.float32)


def composite_background(color: np.ndarray, label: np.ndarray, background: np.ndarray) -> np.ndarray:
    """Paste synthetic foreground over a background image (minibatch.py:130-154)."""
    bg = cv2.resize(background, (color.shape[1], color.shape[0]))
    out = bg.copy()
    I = np.where(label > 0)
    out[I[0], I[1], :] = color[I[0], I[1], :3]
    return out


def build_meta_data(K: np.ndarray, im_scale: float = 1.0, flip_x: bool = False) -> np.ndarray:
    K = np.asarray(K, dtype=np.float64) * im_scale
    K[2, 2] = 1
    Kinv = np.linalg.pinv(K)
    mdata = np.zeros(48, dtype=np.float32)
    mdata[0:9] = K.flatten()
    mdata[9:18] = np.asarray(Kinv).flatten()
    if flip_x:
        mdata[0] *= -1
        mdata[9] *= -1
        mdata[11] *= -1
    return mdata


def pose_rows(frame_index: int, frame: Frame) -> np.ndarray:
    n = frame.poses.shape[2]
    qt = np.zeros((n, 13), dtype=np.float32)
    for j in range(n):
        qt[j, 0] = frame_index
        qt[j, 1] = frame.cls_indexes[j]
        qt[j, 6:10] = mat2quat(frame.poses[:, :3, j])
        qt[j, 10:] = frame.poses[:, 3, j]
    return qt


def rescale_points(points: np.ndarray, extents: np.ndarray, symmetry: np.ndarray, is_symmetric: bool = True) -> np.ndarray:
    """Symmetric-point rescaling for the ADD loss (minibatch.py:49-63)."""
    out = points.copy()
    num_classes = points.shape[0]
    for i in range(1, num_classes):
        ext_max = np.amax(extents[i, :])
        weight = 2.0 / ext_max if ext_max > 0 else 10.0
        if weight < 10:
            weight = 10
        if symmetry[i] > 0 and is_symmetric:
            out[i] = 4 * weight * points[i]
        else:
            out[i] = weight * points[i]
    return out


def get_minibatch(
    frames: List[Frame],
    mcfg: MinibatchConfig,
    extents: np.ndarray,
    points: np.ndarray,
    symmetry: np.ndarray,
    backgrounds: Optional[List[np.ndarray]] = None,
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, np.ndarray]:
    """Assemble the device batch dict with fixed shapes."""
    rng = rng or np.random.RandomState()
    C = mcfg.num_classes
    ims, ims_p, labels, metas, vtargets, vweights, center_rows = [], [], [], [], [], [], []
    vt3, vw3 = [], []
    gan_ims = []
    noise_sigmas = []
    chroma_rows = []
    pose_blob = np.zeros((0, 13), dtype=np.float32)
    want_depth_input = mcfg.input_format in ("DEPTH", "RGBD")
    want_normal_input = mcfg.input_format == "NORMAL"

    def _finish(im):
        """uint8 on the device-targets fast path, mean-subtracted float else."""
        if mcfg.device_targets:
            return np.ascontiguousarray(
                np.clip(np.round(im[..., :3]), 0, 255)
            ).astype(np.uint8)
        return im[..., :3].astype(np.float32) - mcfg.pixel_means

    for i, fr in enumerate(frames):
        if fr.flipped:
            fr = flip_frame(fr)
        if mcfg.scale != 1.0:
            # TRAIN.SCALES_BASE input rescale (reference _get_image_blob,
            # minibatch.py:180-183): image/label/depth resized, projected
            # centers scaled; K is scaled inside build_meta_data and the 3D
            # pose annotations are resolution-independent
            fr = scale_frame(fr, mcfg.scale)
        im = pad_im(fr.color, 16)
        label = pad_im(fr.label.astype(np.int32), 16)
        if fr.is_synthetic and backgrounds:
            bg = backgrounds[rng.randint(len(backgrounds))]
            if isinstance(bg, str):  # lazy path bank (build_background_paths)
                bg = cv2.imread(bg, cv2.IMREAD_COLOR)
            if bg is not None:
                im = composite_background(im, label, bg)
        if mcfg.chromatic:
            if mcfg.device_targets and not mcfg.gan and mcfg.input_format == "COLOR":
                # device-side chromatic (ops/chromatic.py): ship only the
                # three per-image HLS deltas — same draws/order as
                # chromatic_transform (blob.py:69-74) so the host RNG stream
                # is unchanged; the two color-space passes move into the jit
                # train step (~30 ms/batch off the single-core host pipeline)
                chroma_rows.append([
                    float((rng.rand(1)[0] - 0.5) * 0.02 * 180),
                    float((rng.rand(1)[0] - 0.5) * 0.2 * 256),
                    float((rng.rand(1)[0] - 0.5) * 0.2 * 256),
                ])
            else:
                im = chromatic_transform(im, rng=rng)
        if mcfg.add_noise:
            if mcfg.device_targets and not mcfg.gan and mcfg.input_format == "COLOR":
                # device-side gaussian noise: ship only the per-image sigma
                # and add the (H,W) noise field inside the train step's jit
                # graph — the host float passes were ~50 ms/batch, the
                # largest remaining host-pipeline cost. The 10% motion-blur
                # branch stays host-side (cv2 filter2D on uint8 is cheap).
                # Same draws/order as add_noise (blob.py): rand gate, then
                # var = rand*0.3*256.
                if rng.rand(1) < 0.9:
                    noise_sigmas.append(float(rng.rand(1) * 0.3 * 256) ** 0.5)
                else:
                    im = add_noise(im, rng=rng, force_blur=True)
                    noise_sigmas.append(0.0)
            else:
                im = add_noise(im, rng=rng)

        if want_depth_input or want_normal_input:
            # adaptation frames may ship no depth: substitute an all-zero
            # depth so the blob shapes stay aligned (their label blob is -1
            # everywhere, so only the adversarial domain branch consumes them)
            depth_raw = (
                pad_im(fr.depth, 16)
                if fr.depth is not None
                else np.zeros(im.shape[:2], np.float32)
            )
            if want_depth_input:
                im_d = depth_input_image(depth_raw)
                if mcfg.add_noise:
                    im_d = add_noise(im_d, rng=rng)
                if mcfg.input_format == "DEPTH":
                    im = im_d  # depth replaces the color input
                else:
                    ims_p.append(_finish(im_d))
            else:
                im = normal_input_image(depth_raw, fr.factor_depth, fr.intrinsic_matrix)
        if mcfg.gan:
            gan_ims.append(im[..., :3].astype(np.float32) / 127.5 - 1.0)
        ims.append(_finish(im))
        metas.append(build_meta_data(fr.intrinsic_matrix, mcfg.scale))

        if fr.is_adaptation:
            labels.append(-1 * np.ones_like(label))
            center_rows.append(np.zeros((0, 4), np.float32))
            if not mcfg.device_targets:
                vtargets.append(np.zeros(label.shape + (3 * C,), dtype=np.float32))
                vweights.append(np.zeros(label.shape + (3 * C,), dtype=np.float32))
            elif mcfg.vertex_reg_3d:
                vt3.append(np.zeros(label.shape + (3,), dtype=np.float32))
                vw3.append(np.zeros(label.shape, dtype=np.float32))
            continue
        labels.append(label)
        if mcfg.vertex_reg:
            mask = pad_im(fr.mask, 16) if fr.mask is not None else None
            vertmap = pad_im(fr.vertmap, 16) if fr.vertmap is not None else None
            if mcfg.device_targets and not mcfg.vertex_reg_3d:
                # fast path: ship the (G,4) center table; the in-graph
                # generator routes multi-instance pixels to the nearest
                # same-class center (mask-free approximation)
                n_inst = fr.poses.shape[2]
                rows = np.zeros((n_inst, 4), np.float32)
                rows[:, 0] = fr.cls_indexes[:n_inst]
                rows[:, 1:3] = fr.center[:n_inst]
                rows[:, 3] = fr.poses[2, 3, :n_inst]
                center_rows.append(rows)
            elif mcfg.device_targets and mcfg.vertex_reg_3d:
                # compact 3D path: (H,W,3) scaled object coordinates + a
                # (H,W) weight mask; the dense (H,W,3C) blob is expanded
                # in-graph (ops/vertex_targets.smooth_l1_loss_vertex_sparse3d)
                t, w = generate_vertex_targets(
                    label, fr.cls_indexes, fr.center, fr.poses, C,
                    mcfg.vertex_w_inside, mask=mask, vertmap=vertmap,
                    extents=extents, vertex_reg_3d=True,
                )
                lab_safe = np.clip(label, 0, C - 1)
                idx = (3 * lab_safe[..., None] + np.arange(3)).reshape(*label.shape, 3)
                vt3.append(np.take_along_axis(t, idx, axis=2))
                vw3.append(np.take_along_axis(w, idx[..., :1], axis=2)[..., 0])
            else:
                t, w = generate_vertex_targets(
                    label, fr.cls_indexes, fr.center, fr.poses, C,
                    mcfg.vertex_w_inside, mask=mask, vertmap=vertmap,
                    extents=extents, vertex_reg_3d=mcfg.vertex_reg_3d,
                )
                vtargets.append(t)
                vweights.append(w)
        pose_blob = np.concatenate([pose_blob, pose_rows(i, fr)], axis=0)

    # pad GT rows to the static cap
    gt = np.zeros((mcfg.max_gt, 13), dtype=np.float32)
    n = min(len(pose_blob), mcfg.max_gt)
    gt[:n] = pose_blob[:n]

    batch = {
        "data": np.stack(ims) if mcfg.device_targets else np.stack(ims).astype(np.float32),
        "gt_label_2d": np.stack(labels).astype(np.int32),
        "meta_data": np.stack(metas).astype(np.float32),
        "poses": gt,
    }
    if noise_sigmas:
        batch["noise_sigma"] = np.asarray(noise_sigmas, np.float32)
    if chroma_rows:
        batch["chroma_dhls"] = np.asarray(chroma_rows, np.float32)
    if ims_p:
        batch["data_p"] = np.stack(ims_p) if mcfg.device_targets else np.stack(ims_p).astype(np.float32)
    if gan_ims:
        batch["data_gan"] = np.stack(gan_ims)
        # generator noise blob (reference gt_single_data_layer/minibatch.py:320:
        # uniform [-1, 1], dim 100, one row per image) — the dcgan generator's
        # z input. The reference's _get_gan_labels (minibatch.py:424-442) is
        # dead code there (never called), so only the live gan_z path is kept.
        batch["gan_z"] = rng.uniform(-1, 1, (len(gan_ims), 100)).astype(np.float32)
    if mcfg.vertex_reg:
        if mcfg.device_targets and mcfg.vertex_reg_3d:
            batch["vertex_targets3"] = np.stack(vt3)
            batch["vertex_weights3"] = np.stack(vw3)
        elif mcfg.device_targets:
            G = mcfg.max_gt
            gc = np.zeros((len(frames), G, 4), np.float32)
            for i, rows in enumerate(center_rows):
                k = min(len(rows), G)
                gc[i, :k] = rows[:k]
            batch["gt_centers"] = gc
        else:
            batch["vertex_targets"] = np.stack(vtargets)
            batch["vertex_weights"] = np.stack(vweights)
    if mcfg.device_targets:
        # static blobs are NOT replicated into every batch on the fast path —
        # the train step closes over points/symmetry/extents directly
        return batch
    batch["points"] = rescale_points(points, extents, symmetry, mcfg.is_symmetric)
    batch["symmetry"] = symmetry if mcfg.is_symmetric else np.zeros_like(symmetry)
    batch["extents"] = extents
    return batch
