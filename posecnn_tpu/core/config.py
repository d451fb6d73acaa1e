"""Configuration tree for posecnn_tpu.

Mirrors the reference config surface (yuxng/PoseCNN `lib/fcn/config.py:26-269`)
so that the reference's experiment YAMLs (`experiments/cfgs/*.yml`) load
unchanged, while replacing the global `easydict` singleton with typed
dataclasses and an explicit, strict merge (same semantics as the reference's
`_merge_a_into_b`: unknown keys and type mismatches are errors).

TPU-specific additions live under `cfg.TPU` (mesh shape, dtype policy, fixed
shape caps) — everything the reference left implicit because CUDA allowed
dynamic shapes.
"""

from __future__ import annotations

import copy
import dataclasses
import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import numpy as np
import yaml


@dataclass
class TrainConfig:
    # Reference defaults: lib/fcn/config.py:52-238
    WEIGHT_REG: float = 0.0001
    SEGMENTATION: bool = True
    SINGLE_FRAME: bool = False
    TRAINABLE: bool = True
    VERTEX_REG_2D: bool = False
    VERTEX_REG_3D: bool = False
    LABEL_W: float = 1.0
    VERTEX_W: float = 5.0
    VERTEX_W_INSIDE: float = 10.0
    POSE_W: float = 1.0
    # ADD-loss hinge margin on *squared* distance (vgg16_convs.py:194 passes
    # 0.01 — a (10 cm)^2 dead zone that nearly disables the pose gradient;
    # set ~1e-4 for a (1 cm)^2 hinge that actually trains the pose head)
    POSE_MARGIN: float = 0.01
    # normalize ADD loss by valid hough rows, not padded slots (TPU-only knob)
    POSE_NORM_VALID: bool = False
    THRESHOLD_LABEL: float = 1.0
    VOTING_THRESHOLD: float = -1.0
    VISUALIZE: bool = False
    GAN: bool = False
    POSE_REG: bool = False
    MATCHING: bool = False

    # synthetic training
    SYNTHESIZE: bool = False
    SYN_ONLINE: bool = False
    SYN_WIDTH: int = 640
    SYN_HEIGHT: int = 480
    SYNROOT: str = "data/LOV/data_syn/"
    SYNITER: int = 0
    SYNNUM: int = 80000
    SYN_RATIO: int = 1
    SYN_CLASS_INDEX: int = 1
    SYN_TNEAR: float = 0.5
    SYN_TFAR: float = 2.0
    SYN_SAMPLE_OBJECT: bool = True
    SYN_SAMPLE_POSE: bool = False
    SYN_BACKGROUND_SPECIFIC: bool = False

    # domain adaptation
    ADAPT: bool = False
    ADAPT_ROOT: str = ""
    ADAPT_NUM: int = 400
    ADAPT_RATIO: int = 1
    ADAPT_WEIGHT: float = 0.1

    # learning rate
    OPTIMIZER: str = "MOMENTUM"
    # global-norm grad clipping, 0 = off (new knob; needed from scratch)
    GRAD_CLIP: float = 0.0
    LEARNING_RATE: float = 0.001
    MOMENTUM: float = 0.9
    GAMMA: float = 0.1
    STEPSIZE: int = 30000
    SYMSIZE: int = 0

    GRID_SIZE: int = 256
    # input rescale (reference default lists 5 scales and samples one per
    # minibatch, config.py:109 / minibatch.py:29 — but every shipped
    # reference config pins [1.0]). The TPU build uses SCALES_BASE[0] as a
    # single pinned scale: per-iteration random image sizes would break
    # jit's static shapes and retrigger compilation, so the multi-scale
    # sampling that no reference experiment uses is deliberately not kept.
    SCALES_BASE: Tuple[float, ...] = (1.0,)

    # data augmentation
    CHROMATIC: bool = True
    ADD_NOISE: bool = False

    IMS_PER_BATCH: int = 2
    NUM_STEPS: int = 5
    NUM_UNITS: int = 64
    NUM_CLASSES: int = 10
    USE_FLIPPED: bool = True

    SNAPSHOT_ITERS: int = 10000
    SNAPSHOT_PREFIX: str = "caffenet_fast_rcnn"
    SNAPSHOT_INFIX: str = ""
    # write the end-of-run snapshot when max_iters is not a SNAPSHOT_ITERS
    # multiple; measurement runs (e.g. refresh-throttle A/Bs) disable it —
    # a device->host state fetch costs 20 s-15 min through the debug tunnel
    SNAPSHOT_FINAL: bool = True
    DISPLAY: int = 20

    USE_GT: bool = False
    BATCH_SIZE: int = 128
    FG_FRACTION: float = 0.25
    FG_THRESH: float = 0.5
    BG_THRESH_HI: float = 0.5
    BG_THRESH_LO: float = 0.1

    # RPN options (detection variant)
    HAS_RPN: bool = True
    RPN_POSITIVE_OVERLAP: float = 0.7
    RPN_NEGATIVE_OVERLAP: float = 0.3
    RPN_CLOBBER_POSITIVES: bool = False
    RPN_FG_FRACTION: float = 0.5
    RPN_BATCHSIZE: int = 256
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 12000
    RPN_POST_NMS_TOP_N: int = 2000
    RPN_BBOX_INSIDE_WEIGHTS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    RPN_POSITIVE_WEIGHT: float = -1.0
    BBOX_NORMALIZE_TARGETS: bool = True
    BBOX_INSIDE_WEIGHTS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    BBOX_NORMALIZE_TARGETS_PRECOMPUTED: bool = True
    BBOX_NORMALIZE_MEANS: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    BBOX_NORMALIZE_STDS: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)


@dataclass
class TestConfig:
    # Reference defaults: lib/fcn/config.py:205-238
    SEGMENTATION: bool = True
    SINGLE_FRAME: bool = False
    VERTEX_REG_2D: bool = False
    VERTEX_REG_3D: bool = False
    VISUALIZE: bool = False
    RANSAC: bool = False
    # reproduce the reference's NMS column bug bit-for-bit for parity runs
    # (it feeds 7-column rois to nms, lib/fcn/test.py:198 — see
    # engine/test.postprocess_detections)
    REFERENCE_NMS_BUG: bool = False
    GAN: bool = False
    POSE_REG: bool = False
    POSE_REFINE: bool = False
    SYNTHETIC: bool = False
    VOTING_THRESHOLD: float = -1.0
    # the reference code-default is (0.25, 0.5, 1.0, 2.0, 3.0), but its test
    # driver asserts len == 1 (lib/fcn/test.py:63) and every shipped config
    # pins TEST.SCALES_BASE to [1.0] — default to the effective behavior so
    # configs that omit the key don't silently evaluate at quarter scale
    SCALES_BASE: Tuple[float, ...] = (1.0,)
    GRID_SIZE: int = 256
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 6000
    RPN_POST_NMS_TOP_N: int = 300
    BBOX_REG: bool = True
    NMS: float = 0.3


@dataclass
class TPUConfig:
    """TPU-native knobs with no reference counterpart."""

    # mesh: data-parallel axis size 0 = use all local devices
    MESH_DATA: int = 0
    MESH_MODEL: int = 1
    # compute dtype for the conv trunk ('bfloat16' or 'float32'); params stay f32
    COMPUTE_DTYPE: str = "bfloat16"
    # fixed-shape caps (CUDA used dynamic allocation + host round trips;
    # hough_voting_gpu_op.cu.cc:14 fixes MAX_ROI=128)
    MAX_ROI: int = 128
    MAX_DETECTIONS_TEST: int = 32
    MAX_GT: int = 24
    # per-class pixel sample cap inside hough voting (reference samples the
    # class-pixel list with stride skip_pixels; we compact to a fixed budget)
    HOUGH_MAX_SAMPLES: int = 1024
    # stride of the coarse center grid for hough voting (1 = exact reference
    # semantics; >1 = coarse-to-fine with exact local refinement)
    HOUGH_CENTER_STRIDE: int = 4
    # number of active-class slots processed by hough voting
    HOUGH_CLASS_SLOTS: int = 8
    # class-pixel sampler inside hough voting: "exact" = reference row-major
    # compaction; "approx" = approx_max_k (TPU-fast, same detections)
    HOUGH_SAMPLER: str = "approx"
    # candidate-pixel grid stride (1 = reference semantics)
    HOUGH_PIXEL_STRIDE: int = 3
    # per-class pixel skip within the candidate set (reference default 10;
    # 1 recommended with HOUGH_PIXEL_STRIDE > 1)
    HOUGH_SKIP_PIXELS: int = 1
    # bilinear crop_pool (crop_pool_new, network.py:790-831) instead of the
    # exact roi_pool: exact max pooling costs O(R*H*W*C) on TPU
    USE_CROP_POOL: bool = True
    # isolation/debug: drive training-time hough voting from GT labels +
    # GT vertex targets (perfect detections for the quaternion branch) —
    # see PoseCNNConfig.hough_from_gt
    HOUGH_FROM_GT: bool = False
    # mixed teacher forcing: per-image probability that training-time hough
    # voting consumes GT labels/centers instead of the predicted heads —
    # see PoseCNNConfig.hough_gt_mix. 0.0 = reference behavior
    HOUGH_GT_MIX: float = 0.0
    # include optimizer state in snapshots (False = light params-only
    # checkpoints, 4x less device->host traffic; resume reinits momentum)
    CHECKPOINT_OPT_STATE: bool = True
    # "npz": single-fetch atomic snapshot (single-host; robust on tunneled
    # platforms where orbax async saves stall); "orbax": multi-host sharded
    CHECKPOINT_FORMAT: str = "npz"
    # build vertex targets + mean subtraction inside the train step's jit
    # graph (host ships uint8 frames + a small GT table instead of the
    # 162 MB/batch float target blob) — see ops/vertex_targets.py
    DEVICE_TARGETS: bool = True
    # point cap for the ADD/ADD-S loss (reference uses the min point count
    # over classes, lov.py:141-158)
    ADD_NUM_POINTS: int = 1024
    # stage the whole (frozen) training set into device HBM and sample
    # batches inside the jit train step (data/device_bank.py) — removes all
    # per-iteration host work; requires a fixed single-frame COLOR dataset
    # with 2D vertex regression and no SYNTHESIZE/ADAPT/flip streams
    DEVICE_BANK: bool = False
    # continuous bank refresh (data/bank_refresh.py): a background host
    # thread renders fresh synthetic scenes and splices them into the HBM
    # bank during training — restores the reference's never-reuse-a-frame
    # property (its render thread streams fresh scenes per iteration,
    # tools/train_net.py:155-258) that a frozen bank gives up
    BANK_REFRESH: bool = False
    # frames per refresh chunk (one H2D splice + HBM copy per chunk)
    BANK_REFRESH_CHUNK: int = 64
    # seconds of sleep between renders: caps the refresher's duty cycle on
    # the shared single host core (0 = render flat out)
    BANK_REFRESH_THROTTLE: float = 0.0
    # quaternion-space auxiliary loss weight for non-symmetric classes
    # (TrainHParams.quat_w): strong-gradient complement to the ADD loss's
    # plateau at large rotation errors. 0 = reference behavior
    QUAT_AUX_W: float = 0.0
    # object-normalized log-z channel weighting in the fused vertex loss
    # (ops/vertex_targets.smooth_l1_loss_vertex_sparse z_obj_norm): equalize
    # per-instance (not per-pixel) contributions so the depth head's
    # effective prior is object-uniform — counters the measured 0.85-slope
    # z attenuation toward the pixel-weighted prior mean (~0.96 m,
    # output/*/z_analysis.json). False = reference behavior
    VERTEX_Z_OBJ_NORM: bool = False
    # host prefetch depth (reference: tf.FIFOQueue(25), vgg16_convs.py:45)
    PREFETCH: int = 4
    # debug/sanitizer toggles (the reference had none, SURVEY.md §5): raise
    # on NaN/Inf in any jit output / run op-by-op without jit fusion
    DEBUG_NANS: bool = False
    DEBUG_DISABLE_JIT: bool = False
    # ICP refinement iterations (JAX Gauss-Newton; replaces synthesize.cpp solveICP)
    ICP_ITERS: int = 20
    # point-to-plane energy weight in the ICP refiner (0 = point-to-point
    # only). First-order equivalent of the reference solveICP SDF term
    # (synthesize.cpp:2052-2200); see engine/refine.icp_refine. Default 1.0
    # won the round-5 A/B: ADD-S AUC+ICP 0.549 vs 0.538 on the refresh-160K
    # checkpoint (BASELINE.md round-5 table)
    ICP_PLANE_WEIGHT: float = 1.0
    DONATE_BATCH: bool = True


@dataclass
class Config:
    # Reference defaults: lib/fcn/config.py:31-49, 240-269
    FLIP_X: bool = False
    INPUT: str = "RGBD"
    NETWORK: str = "VGG16"
    RIG: str = ""
    CAD: str = ""
    POSE: str = ""
    BACKGROUND: str = ""
    USE_GPU_NMS: bool = True
    ANCHOR_SCALES: Tuple[float, ...] = (8, 16, 32)
    ANCHOR_RATIOS: Tuple[float, ...] = (0.5, 1, 2)
    FEATURE_STRIDE: int = 16
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    TPU: TPUConfig = field(default_factory=TPUConfig)
    # BGR pixel means, shape (1,1,3) — reference config.py:242 (cv2 BGR order!)
    PIXEL_MEANS: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)
    RNG_SEED: int = 3
    EPS: float = 1e-14
    ROOT_DIR: str = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))
    EXP_DIR: str = "default"
    GPU_ID: int = 0

    def pixel_means(self) -> np.ndarray:
        return np.array(self.PIXEL_MEANS, dtype=np.float64).reshape(1, 1, 3)


# Global config instance, like the reference's `cfg` singleton
# (lib/fcn/config.py:26-29). Modules read it at call time, never at trace time
# inside jit — jitted functions receive explicit static arguments instead.
cfg = Config()


class ConfigError(KeyError):
    pass


def _merge_into(dc: Any, overrides: dict, path: str = "") -> None:
    """Strict merge of a dict into a dataclass tree.

    Same contract as the reference `_merge_a_into_b` (lib/fcn/config.py:271-298):
    every key must already exist; value types must match (int/float coercion
    allowed the same way numpy would allow it); nested dicts recurse.
    """
    names = {f.name: f for f in dataclasses.fields(dc)}
    for key, value in overrides.items():
        if key not in names:
            raise ConfigError(f"{path}{key} is not a valid config key")
        current = getattr(dc, key)
        if dataclasses.is_dataclass(current):
            if not isinstance(value, dict):
                raise ConfigError(f"{path}{key}: expected a mapping")
            _merge_into(current, value, path=f"{path}{key}.")
            continue
        coerced = _coerce(value, current, f"{path}{key}")
        setattr(dc, key, coerced)


def _coerce(value: Any, old: Any, where: str) -> Any:
    if old is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        raise ConfigError(f"{where}: expected bool, got {type(value).__name__}")
    if isinstance(old, float):
        if isinstance(value, (int, float)):
            return float(value)
        raise ConfigError(f"{where}: expected float, got {type(value).__name__}")
    if isinstance(old, int):
        if isinstance(value, bool):
            raise ConfigError(f"{where}: expected int, got bool")
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        raise ConfigError(f"{where}: expected int, got {type(value).__name__}")
    if isinstance(old, str):
        if isinstance(value, str):
            return value
        raise ConfigError(f"{where}: expected str, got {type(value).__name__}")
    if isinstance(old, tuple):
        if isinstance(value, (list, tuple)):
            return tuple(value)
        raise ConfigError(f"{where}: expected sequence, got {type(value).__name__}")
    return value


def _yaml_load(filename: str) -> dict:
    # Reference YAMLs contain `!!python/tuple` tags (e.g. lov_color_2d.yml:12);
    # register a safe constructor for just that tag rather than unsafe_load.
    class _Loader(yaml.SafeLoader):
        pass

    _Loader.add_constructor(
        "tag:yaml.org,2002:python/tuple",
        lambda loader, node: tuple(loader.construct_sequence(node)),
    )
    with open(filename, "r") as f:
        return yaml.load(f, Loader=_Loader) or {}


def cfg_from_file(filename: str, target: Optional[Config] = None) -> Config:
    """Load a YAML config file and merge it into the (global) config."""
    target = cfg if target is None else target
    _merge_into(target, _yaml_load(filename))
    return target


def apply_debug_flags(config: Optional[Config] = None) -> None:
    """Apply TPU.DEBUG_* sanitizer toggles to the JAX runtime (call after
    config load, before tracing). The reference has no equivalent
    (SURVEY.md §5 'sanitizers: none')."""
    c = cfg if config is None else config
    if c.TPU.DEBUG_NANS or c.TPU.DEBUG_DISABLE_JIT:
        import jax

        if c.TPU.DEBUG_NANS:
            jax.config.update("jax_debug_nans", True)
        if c.TPU.DEBUG_DISABLE_JIT:
            jax.config.update("jax_disable_jit", True)


def cfg_fresh(filename: Optional[str] = None) -> Config:
    """Build an isolated Config (for tests / parallel experiments)."""
    c = Config()
    if filename is not None:
        cfg_from_file(filename, target=c)
    return c


def cfg_replace(target: Config, **kwargs) -> Config:
    out = copy.deepcopy(target)
    _merge_into(out, kwargs)
    return out


def get_output_dir(imdb_name: str, net_name: Optional[str] = None, config: Optional[Config] = None) -> str:
    """Artifact directory: output/<EXP_DIR>/<imdb>[/<net>].

    Same layout as the reference (lib/fcn/config.py:253-269).
    """
    config = cfg if config is None else config
    path = osp.abspath(osp.join(config.ROOT_DIR, "output", config.EXP_DIR, imdb_name))
    if net_name is None:
        return path
    return osp.join(path, net_name)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
