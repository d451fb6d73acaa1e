#!/usr/bin/env python
"""Generate the experiment config + script harness.

The reference ships 84 hand-written YAMLs (`experiments/cfgs/`) and 172 bash
wrappers (`experiments/scripts/`) covering its experiment families. Here both
are generated from one table per family; re-run this script after editing it:

    python experiments/gen_cfgs.py

Families (mirroring the reference surface):
  * lov (YCB-Video 21 classes): color/depth/rgbd x 2d/3d voting, pose
    regression, full-image variant, detection (RPN) variant, per-object
    single-class configs, domain adaptation.
  * ycb: color 2d (+pose) and per-object configs.
  * linemod: per-class pose / det / 3d configs (13 classes).
  * rgbd_scene / shapenet_scene: single/multi-frame segmentation over
    color/depth/normal/rgbd inputs (+ fcn8 baselines); shapenet_single gan.
  * sym, yumi: small auxiliary datasets.
"""

from __future__ import annotations

import os

HERE = os.path.dirname(os.path.abspath(__file__))
CFG_DIR = os.path.join(HERE, "cfgs")
SCRIPT_DIR = os.path.join(HERE, "scripts")

LINEMOD_CLASSES = [
    "ape", "benchvise", "camera", "can", "cat", "driller", "duck",
    "eggbox", "glue", "holepuncher", "iron", "lamp", "phone",
]
LOV_OBJECTS = ["banana", "bowl", "gelatin_box", "sugar_box", "wood_block"]
YCB_OBJECTS = [
    "cracker_box", "mustard_bottle", "potted_meat_can", "sugar_box",
    "tomato_soup_can",
]
# single-object dataset splits are registered under full YCB ids
YCB_ID = {
    "banana": "011_banana", "bowl": "024_bowl", "gelatin_box": "009_gelatin_box",
    "sugar_box": "004_sugar_box", "wood_block": "036_wood_block",
    "cracker_box": "003_cracker_box", "mustard_bottle": "006_mustard_bottle",
    "potted_meat_can": "010_potted_meat_can", "tomato_soup_can": "005_tomato_soup_can",
}


def yml(exp_dir, input_mode, train, test, network=None):
    """Render one config as YAML text (our strict-merge schema)."""
    lines = [f"EXP_DIR: {exp_dir}", f"INPUT: {input_mode}"]
    if network:
        lines.append(f"NETWORK: {network}")
    lines.append("TRAIN:")
    for k, v in train.items():
        lines.append(f"  {k}: {v}")
    lines.append("TEST:")
    for k, v in test.items():
        lines.append(f"  {k}: {v}")
    return "\n".join(lines) + "\n"


def base_train(classes, units=64, **kw):
    d = dict(
        SINGLE_FRAME=True,
        TRAINABLE=True,
        WEIGHT_REG=0.0001,
        LEARNING_RATE=0.001,
        MOMENTUM=0.9,
        GAMMA=0.1,
        STEPSIZE=80000,
        IMS_PER_BATCH=2,
        NUM_CLASSES=classes,
        NUM_UNITS=units,
        SNAPSHOT_ITERS=10000,
        USE_FLIPPED=False,
        CHROMATIC=True,
        ADD_NOISE=True,
    )
    d.update(kw)
    return d


def base_test(classes, **kw):
    # NUM_CLASSES lives under TRAIN only (lib/fcn/config.py:205-238 has no
    # TEST.NUM_CLASSES); `classes` kept for call-site symmetry
    d = dict(SINGLE_FRAME=True)
    d.update(kw)
    return d


CONFIGS = {}


def add(name, text):
    assert name not in CONFIGS, name
    CONFIGS[name] = text


# ---------------------------------------------------------------- lov (YCB-Video)
for mode, inp in (("color", "COLOR"), ("depth", "DEPTH"), ("rgbd", "RGBD")):
    add(
        f"lov_{mode}_2d",
        yml(
            "lov", inp,
            base_train(22, VERTEX_REG_2D=True, POSE_REG=True,
                       SNAPSHOT_INFIX="lov",
                       SNAPSHOT_PREFIX=f"vgg16_fcn_{mode}_single_frame_2d_pose_add",
                       SYNTHESIZE=True, SYN_RATIO=5, SYNNUM=80000),
            base_test(22, VERTEX_REG_2D=True, POSE_REG=True, VISUALIZE=False),
        ),
    )
add(
    "lov_color_2d_pose",
    yml(
        "lov", "COLOR",
        base_train(22, VERTEX_REG_2D=True, POSE_REG=True, POSE_W=2.0,
                   SNAPSHOT_INFIX="lov",
                   SNAPSHOT_PREFIX="vgg16_fcn_color_single_frame_2d_pose_add"),
        base_test(22, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)
add(
    "lov_color_3d",
    yml(
        "lov", "COLOR",
        base_train(22, VERTEX_REG_3D=True, GRID_SIZE=256,
                   SNAPSHOT_INFIX="lov",
                   SNAPSHOT_PREFIX="vgg16_fcn_color_single_frame_3d"),
        base_test(22, VERTEX_REG_3D=True),
    ),
)
add(
    "lov_color_2d_full",
    yml(
        "lov", "COLOR",
        base_train(22, VERTEX_REG_2D=True, POSE_REG=True,
                   SNAPSHOT_INFIX="lov",
                   SNAPSHOT_PREFIX="vgg16_fcn_full_color_2d_pose"),
        base_test(22, VERTEX_REG_2D=True, POSE_REG=True),
        network="VGG16FULL",
    ),
)
add(
    "lov_det",
    yml(
        "lov", "COLOR",
        base_train(22, POSE_REG=True, SNAPSHOT_INFIX="lov",
                   SNAPSHOT_PREFIX="vgg16_det_color_pose"),
        base_test(22, POSE_REG=True),
        network="VGG16DET",
    ),
)
for obj in LOV_OBJECTS:
    add(
        f"lov_color_{obj}",
        yml(
            "lov", "COLOR",
            base_train(2, VERTEX_REG_2D=True, POSE_REG=True,
                       SNAPSHOT_INFIX=obj,
                       SNAPSHOT_PREFIX=f"vgg16_fcn_color_{obj}"),
            base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
        ),
    )
add(
    "lov_color_sugar_box_adapt",
    yml(
        "lov", "COLOR",
        base_train(2, VERTEX_REG_2D=True, POSE_REG=True, ADAPT=True,
                   ADAPT_RATIO=2, ADAPT_WEIGHT=0.1,
                   SNAPSHOT_INFIX="sugar_box_adapt",
                   SNAPSHOT_PREFIX="vgg16_fcn_color_sugar_box_adapt"),
        base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)
add(
    "lov_single_color_pose",
    yml(
        "lov_single", "COLOR",
        base_train(2, VERTEX_REG_2D=True, POSE_REG=True,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_single"),
        base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)
add(
    "lov_single_color_synthesize",
    yml(
        "lov_single", "COLOR",
        base_train(2, VERTEX_REG_2D=True, POSE_REG=True, SYNTHESIZE=True,
                   SYN_RATIO=1, SNAPSHOT_PREFIX="vgg16_fcn_color_single_syn"),
        base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)
add(
    "lov_single_depth",
    yml(
        "lov_single", "DEPTH",
        base_train(2, VERTEX_REG_2D=True, SNAPSHOT_PREFIX="vgg16_fcn_depth_single"),
        base_test(2, VERTEX_REG_2D=True),
    ),
)

# ---------------------------------------------------------------- ycb
add(
    "ycb_color_2d",
    yml(
        "ycb", "COLOR",
        base_train(22, VERTEX_REG_2D=True,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_ycb_2d"),
        base_test(22, VERTEX_REG_2D=True),
    ),
)
add(
    "ycb_color_2d_pose",
    yml(
        "ycb", "COLOR",
        base_train(22, VERTEX_REG_2D=True, POSE_REG=True,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_ycb_2d_pose"),
        base_test(22, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)
for obj in YCB_OBJECTS:
    add(
        f"ycb_color_{obj}",
        yml(
            "ycb", "COLOR",
            base_train(2, VERTEX_REG_2D=True, POSE_REG=True,
                       SNAPSHOT_INFIX=obj,
                       SNAPSHOT_PREFIX=f"vgg16_fcn_color_ycb_{obj}"),
            base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
        ),
    )

# ---------------------------------------------------------------- linemod
for cls in LINEMOD_CLASSES:
    add(
        f"linemod_{cls}_pose",
        yml(
            "linemod", "COLOR",
            base_train(2, VERTEX_REG_2D=True, POSE_REG=True, STEPSIZE=40000,
                       SNAPSHOT_INFIX=cls,
                       SNAPSHOT_PREFIX=f"vgg16_fcn_color_linemod_{cls}_pose"),
            base_test(2, VERTEX_REG_2D=True, POSE_REG=True),
        ),
    )
    add(
        f"linemod_{cls}_det",
        yml(
            "linemod", "COLOR",
            base_train(2, POSE_REG=True, STEPSIZE=40000,
                       SNAPSHOT_INFIX=cls,
                       SNAPSHOT_PREFIX=f"vgg16_det_color_linemod_{cls}"),
            base_test(2, POSE_REG=True),
            network="VGG16DET",
        ),
    )
    add(
        f"linemod_{cls}_3d",
        yml(
            "linemod", "COLOR",
            base_train(2, VERTEX_REG_3D=True, STEPSIZE=40000,
                       SNAPSHOT_INFIX=cls,
                       SNAPSHOT_PREFIX=f"vgg16_fcn_color_linemod_{cls}_3d"),
            base_test(2, VERTEX_REG_3D=True),
        ),
    )
add(
    "linemod_color_2d",
    yml(
        "linemod", "COLOR",
        base_train(16, VERTEX_REG_2D=True, POSE_REG=True,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_linemod_2d"),
        base_test(16, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)

# ------------------------------------------------- rgbd_scene / shapenet_scene
for scene, classes in (("rgbd_scene", 10), ("shapenet_scene", 8)):
    for mode, inp in (
        ("color", "COLOR"), ("depth", "DEPTH"), ("normal", "NORMAL"), ("rgbd", "RGBD")
    ):
        add(
            f"{scene}_single_{mode}",
            yml(
                scene, inp,
                base_train(classes, SNAPSHOT_PREFIX=f"vgg16_fcn_{mode}_single"),
                base_test(classes),
            ),
        )
        add(
            f"{scene}_multi_{mode}",
            yml(
                scene, inp,
                dict(SINGLE_FRAME=False, NUM_STEPS=5, IMS_PER_BATCH=1,
                     NUM_CLASSES=classes, NUM_UNITS=64, LEARNING_RATE=0.001,
                     MOMENTUM=0.9, GAMMA=0.1, STEPSIZE=30000,
                     SNAPSHOT_ITERS=10000,
                     SNAPSHOT_PREFIX=f"vgg16_fcn_{mode}_multi"),
                dict(SINGLE_FRAME=False),
            ),
        )
for mode in ("color", "depth", "normal"):
    add(
        f"rgbd_scene_single_{mode}_fcn8",
        yml(
            "rgbd_scene", mode.upper(),
            base_train(10, SNAPSHOT_PREFIX=f"fcn8_{mode}_single"),
            base_test(10),
            network="FCN8VGG",
        ),
    )
add(
    "shapenet_single_single_color",
    yml(
        "shapenet_single", "COLOR",
        base_train(2, SNAPSHOT_PREFIX="vgg16_fcn_color_single"),
        base_test(2),
    ),
)
add(
    "shapenet_single_single_color_gan",
    yml(
        "shapenet_single", "COLOR",
        base_train(2, GAN=True, SNAPSHOT_PREFIX="vgg16_gan_color_single"),
        base_test(2, GAN=True),
        network="VGG16GAN",
    ),
)

# ---------------------------------------------------------------- sym / yumi
add(
    "sym",
    yml(
        "sym", "COLOR",
        base_train(2, VERTEX_REG_2D=True, SYMSIZE=3,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_sym"),
        base_test(2, VERTEX_REG_2D=True),
    ),
)
add(
    "yumi_color_2d",
    yml(
        "yumi", "COLOR",
        base_train(8, VERTEX_REG_2D=True, SNAPSHOT_PREFIX="vgg16_fcn_color_yumi"),
        base_test(8, VERTEX_REG_2D=True),
    ),
)

add(
    "lov_syn_color_2d",
    yml(
        "lov_syn", "COLOR",
        base_train(22, VERTEX_REG_2D=True, POSE_REG=True,
                   SNAPSHOT_ITERS=2000, GRAD_CLIP=10.0,
                   SNAPSHOT_PREFIX="vgg16_fcn_color_lov_syn_2d_pose"),
        base_test(22, VERTEX_REG_2D=True, POSE_REG=True),
    ) + "TPU:\n  CHECKPOINT_OPT_STATE: False\n",
)

# toy: dataset-free smoke config (kept in sync with tests)
add(
    "toy_pose",
    yml(
        "toy", "COLOR",
        dict(SINGLE_FRAME=True, LEARNING_RATE=0.001, GRAD_CLIP=10.0,
             IMS_PER_BATCH=2,
             NUM_CLASSES=4, NUM_UNITS=16, VERTEX_REG_2D=True, POSE_REG=True,
             CHROMATIC=True, ADD_NOISE=False, SNAPSHOT_ITERS=50, DISPLAY=2),
        dict(SINGLE_FRAME=True, VERTEX_REG_2D=True, POSE_REG=True),
    ),
)


# ---------------------------------------------------------------- scripts
TRAIN_SH = """#!/bin/bash
# {name}: train ({imdb})
# generated by experiments/gen_cfgs.py — edit there
set -ex
export PYTHONUNBUFFERED=1
LOG="output/logs/{name}_train_$(date +%Y%m%d_%H%M%S).log"
mkdir -p output/logs

python tools/train_net.py \\
  --cfg experiments/cfgs/{cfg}.yml \\
  --imdb {imdb} \\
  --iters {iters} \\
  "$@" 2>&1 | tee "$LOG"
"""

TEST_SH = """#!/bin/bash
# {name}: evaluate ({imdb})
# generated by experiments/gen_cfgs.py — edit there
set -ex
export PYTHONUNBUFFERED=1
LOG="output/logs/{name}_test_$(date +%Y%m%d_%H%M%S).log"
mkdir -p output/logs

python tools/test_net.py \\
  --cfg experiments/cfgs/{cfg}.yml \\
  --imdb {imdb} \\
  "$@" 2>&1 | tee "$LOG"
"""

DEMO_SH = """#!/bin/bash
# demo: run PoseCNN inference on the bundled demo frames
# generated by experiments/gen_cfgs.py — edit there
set -ex
python tools/demo.py --images data/demo_images "$@"
"""

SMOKE_SH = """#!/bin/bash
# {name}: subsystem smoke tool (reference experiments/scripts/{name}.sh)
# generated by experiments/gen_cfgs.py — edit there
set -ex
export PYTHONUNBUFFERED=1
python {tool} {args} "$@"
"""

# smoke-tool wrappers mirroring the reference's test_*.sh surface
# (SURVEY.md §4: subsystem smoke tools each had a matching script)
SMOKE_SCRIPTS = [
    ("test_icp", "tools/test_icp.py", ""),
    ("test_kinect_fusion", "tools/test_kinect_fusion.py", ""),
    ("test_synthesis", "tools/test_synthesis.py", "--imdb lov_syn_val"),
    ("test_synthesis_linemod", "tools/test_synthesis.py", "--imdb linemod_ape_test"),
    ("test_synthesis_sym", "tools/test_synthesis.py", "--imdb sym_val"),
    ("test_synthesis_yumi", "tools/test_synthesis.py", "--imdb yumi_val"),
    ("test_render_poses", "tools/render_poses.py", ""),
    ("test_render_poses_color", "tools/render_poses.py", "--alpha 1.0"),
    ("test_images", "tools/demo.py", "--images data/demo_images"),
    ("test_images_ycb", "tools/demo.py", "--images data/demo_images --cfg experiments/cfgs/ycb_color_2d_pose.yml"),
    ("test_images_yumi", "tools/demo.py", "--images data/demo_images --cfg experiments/cfgs/yumi_color_2d.yml"),
    # ROS-listener equivalents: directory-watch / TCP online inference
    ("test_images_ros", "tools/online.py", "--watch output/camera --once"),
    ("test_ros_bag", "tools/online.py", "--serve 5555"),
    ("check_data", "tools/check_data.py", "--imdb toy_train"),
]


def script_pairs():
    """(script_name, cfg_name, train_imdb, test_imdb, iters) per experiment."""
    out = []
    for mode in ("color", "depth", "rgbd"):
        out.append((f"lov_{mode}_2d", f"lov_{mode}_2d", "lov_train", "lov_keyframe", 160000))
    out.append(("lov_color_2d_pose", "lov_color_2d_pose", "lov_train", "lov_keyframe", 160000))
    out.append(("lov_color_3d", "lov_color_3d", "lov_train", "lov_keyframe", 160000))
    out.append(("lov_color_2d_full", "lov_color_2d_full", "lov_train", "lov_keyframe", 160000))
    out.append(("lov_det", "lov_det", "lov_train", "lov_keyframe", 160000))
    for obj in LOV_OBJECTS:
        out.append((f"lov_color_{obj}", f"lov_color_{obj}",
                    f"lov_single_{YCB_ID[obj]}_train", f"lov_single_{YCB_ID[obj]}_val", 40000))
    out.append(("lov_color_sugar_box_adapt", "lov_color_sugar_box_adapt",
                "lov_single_004_sugar_box_train", "lov_single_004_sugar_box_val", 40000))
    out.append(("ycb_color_2d", "ycb_color_2d", "ycb_trainval", "ycb_val", 120000))
    out.append(("ycb_color_2d_pose", "ycb_color_2d_pose", "ycb_trainval", "ycb_val", 120000))
    for obj in YCB_OBJECTS:
        out.append((f"ycb_color_{obj}", f"ycb_color_{obj}",
                    f"ycb_single_{YCB_ID[obj]}_train", f"ycb_single_{YCB_ID[obj]}_val", 40000))
    for cls in LINEMOD_CLASSES:
        out.append((f"linemod_{cls}", f"linemod_{cls}_pose",
                    f"linemod_{cls}_train", f"linemod_{cls}_test", 40000))
        out.append((f"linemod_{cls}_det", f"linemod_{cls}_det",
                    f"linemod_{cls}_train", f"linemod_{cls}_test", 40000))
        out.append((f"linemod_{cls}_3d", f"linemod_{cls}_3d",
                    f"linemod_{cls}_train", f"linemod_{cls}_test", 40000))
    for scene in ("rgbd_scene", "shapenet_scene"):
        for mode in ("color", "depth", "normal", "rgbd"):
            out.append((f"{scene}_single_{mode}", f"{scene}_single_{mode}",
                        f"{scene}_train", f"{scene}_val", 40000))
            out.append((f"{scene}_multi_{mode}", f"{scene}_multi_{mode}",
                        f"{scene}_train", f"{scene}_val", 40000))
    for mode in ("color", "depth", "normal"):
        out.append((f"rgbd_scene_single_{mode}_fcn8", f"rgbd_scene_single_{mode}_fcn8",
                    "rgbd_scene_train", "rgbd_scene_val", 40000))
    out.append(("shapenet_single_color", "shapenet_single_single_color",
                "shapenet_single_train", "shapenet_single_val", 40000))
    out.append(("shapenet_single_color_gan", "shapenet_single_single_color_gan",
                "shapenet_single_train", "shapenet_single_val", 40000))
    out.append(("lov_syn_color_2d", "lov_syn_color_2d", "lov_syn_train", "lov_syn_val", 20000))
    out.append(("sym", "sym", "sym_train", "sym_val", 20000))
    out.append(("yumi_color_2d", "yumi_color_2d", "yumi_train", "yumi_val", 40000))
    out.append(("toy_pose", "toy_pose", "toy_train", "toy_val", 100))
    return out


def main():
    os.makedirs(CFG_DIR, exist_ok=True)
    os.makedirs(SCRIPT_DIR, exist_ok=True)
    for name, text in CONFIGS.items():
        with open(os.path.join(CFG_DIR, name + ".yml"), "w") as f:
            f.write(text)
    n_scripts = 0
    for name, cfg, train_imdb, test_imdb, iters in script_pairs():
        p = os.path.join(SCRIPT_DIR, name + "_train.sh")
        with open(p, "w") as f:
            f.write(TRAIN_SH.format(name=name, cfg=cfg, imdb=train_imdb, iters=iters))
        os.chmod(p, 0o755)
        p = os.path.join(SCRIPT_DIR, name + "_test.sh")
        with open(p, "w") as f:
            f.write(TEST_SH.format(name=name, cfg=cfg, imdb=test_imdb))
        os.chmod(p, 0o755)
        n_scripts += 2
    p = os.path.join(SCRIPT_DIR, "demo.sh")
    with open(p, "w") as f:
        f.write(DEMO_SH)
    os.chmod(p, 0o755)
    for name, tool, args in SMOKE_SCRIPTS:
        p = os.path.join(SCRIPT_DIR, name + ".sh")
        with open(p, "w") as f:
            f.write(SMOKE_SH.format(name=name, tool=tool, args=args))
        os.chmod(p, 0o755)
        n_scripts += 1
    print(f"wrote {len(CONFIGS)} configs, {n_scripts + 1} scripts")


if __name__ == "__main__":
    main()
