"""PoseEvaluator unit tests against hand-built frames.

Covers the matching protocol (greedy score-ordered one-to-one, miss counting),
per-class AUC math, LINEMOD diameter thresholds, symmetric-class ADD-S,
reprojection metric + z-flip correction, and refined/ICP variants.
"""
import numpy as np
import pytest

from posecnn_tpu.data.imdb import PoseEvaluator
from posecnn_tpu.utils.quaternion_np import mat2quat


CLASSES = ["__background__", "box", "cyl"]
EXTENTS = np.array([[0, 0, 0], [0.2, 0.2, 0.2], [0.1, 0.1, 0.3]], np.float32)


def _points():
    rng = np.random.RandomState(0)
    return [np.zeros((64, 3)), rng.randn(64, 3) * 0.05, rng.randn(64, 3) * 0.05]


def _gt(translations, cls_indexes):
    """(3,4,N) gt poses with identity rotation."""
    n = len(translations)
    poses = np.zeros((3, 4, n), np.float32)
    for j, t in enumerate(translations):
        poses[:3, :3, j] = np.eye(3)
        poses[:, 3, j] = t
    return poses, np.array(cls_indexes)


def _roi(cls, score):
    return [0, cls, 0, 0, 10, 10, score]


def _pose(quat, t):
    return np.concatenate([quat, t]).astype(np.float32)


IDQ = np.array([1.0, 0, 0, 0])
LABELS = np.zeros((4, 4), np.int32)


def make_eval(**kw):
    return PoseEvaluator(CLASSES, EXTENTS, _points(), ["cyl"], **kw)


def test_perfect_detection_scores_full():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    assert ev.pose_accuracy() == {"box": 1.0}
    assert ev.adds_auc() == pytest.approx(1.0)


def test_missed_gt_counts_as_infinite_error():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0], [0.5, 0, 1.0]], [1, 1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    recs = ev.pose_errors[1]
    assert len(recs) == 2
    assert sorted(r["err"] for r in recs)[1] == np.inf
    assert ev.pose_accuracy() == {"box": 0.5}
    # one exact hit, one miss: accuracy jumps to 0.5 at t=0 -> AUC 0.5
    assert ev.adds_auc() == pytest.approx(0.5)


def test_greedy_one_to_one_matching():
    """Higher-scored detection claims its nearest GT; each GT claimed once."""
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0], [1.0, 0, 1.0]], [1, 1])
    rois = np.array([_roi(1, 0.5), _roi(1, 0.9)], np.float32)
    poses = np.array([
        _pose(IDQ, [1.0, 0, 1.0]),   # low score, near GT 1
        _pose(IDQ, [0, 0, 1.0]),     # high score, near GT 0
    ])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    errs = sorted(r["err"] for r in ev.pose_errors[1])
    assert errs == pytest.approx([0.0, 0.0], abs=1e-6)


def test_extra_detection_does_not_double_count():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9), _roi(1, 0.8)], np.float32)
    poses = np.array([_pose(IDQ, [0, 0, 1.0]), _pose(IDQ, [2.0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    assert len(ev.pose_errors[1]) == 1  # one GT -> one record


def test_wrong_class_detection_never_matches():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(2, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    assert ev.pose_errors[1][0]["err"] == np.inf
    assert ev.pose_errors[2] == []


def test_auc_midpoint():
    """err exactly half the 0.1 m integration range -> AUC 0.5."""
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0.05, 0, 1.0])])  # 5 cm translation error
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    assert ev.pose_errors[1][0]["err"] == pytest.approx(0.05, abs=1e-6)
    assert ev.adds_auc() == pytest.approx(0.5, abs=1e-6)
    assert ev.adds_auc_pooled() == pytest.approx(0.5, abs=1e-6)


def test_per_class_auc_is_mean_not_pooled():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0], [0.5, 0, 1.0]], [1, 2])
    rois = np.array([_roi(1, 0.9), _roi(2, 0.8)], np.float32)
    poses = np.array([_pose(IDQ, [0, 0, 1.0]), _pose(IDQ, [0.5, 0, 1.2])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    per = ev.adds_auc_per_class()
    assert per["box"] == pytest.approx(1.0)
    assert ev.adds_auc() == pytest.approx((per["box"] + per["cyl"]) / 2)


def test_diameter_threshold_used_when_given():
    diam = np.array([0.0, 0.5, 0.5])
    ev = make_eval(diameters=diam)
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0.04, 0, 1.0])])  # 4 cm error
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    # 0.1 * diameter = 5 cm > 4 cm -> correct; extent threshold would be
    # 0.1 * ||(0.2,0.2,0.2)|| = 3.46 cm -> incorrect
    assert ev.pose_errors[1][0]["thresh"] == pytest.approx(0.05)
    assert ev.pose_accuracy() == {"box": 1.0}


def test_symmetric_class_uses_adds():
    """cyl is symmetric: a 180-deg z-rotation of a z-symmetric point cloud
    must evaluate near zero under ADD-S but large under ADD."""
    theta = np.pi
    Rz = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1.0],
    ])
    # z-axis ring of points (perfectly symmetric)
    ang = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ring = np.stack([0.05 * np.cos(ang), 0.05 * np.sin(ang), np.zeros(64)], 1)
    pts = [np.zeros((64, 3)), ring, ring]
    ev = PoseEvaluator(CLASSES, EXTENTS, pts, ["cyl"])
    gt, cls = _gt([[0, 0, 1.0]], [2])
    rois = np.array([_roi(2, 0.9)], np.float32)
    poses = np.array([_pose(mat2quat(Rz), [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls)
    assert ev.pose_errors[2][0]["err"] < 1e-3  # ADD would be ~0.1


def test_refined_and_icp_variants_in_summary():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0.08, 0, 1.0])])
    poses_icp = np.array([_pose(IDQ, [0, 0, 1.0])])  # ICP fixes it
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls,
                 poses_refined=poses, poses_icp=poses_icp)
    s = ev.summary()
    assert s["adds_auc_icp"] == pytest.approx(1.0)
    assert s["adds_auc_icp"] > s["adds_auc"]
    assert "adds_auc_refined" in s and "pose_accuracy_icp" in s


def test_icp_auc_counts_zero_detection_frames_as_misses():
    """A frame with no detections (engine passes poses_icp=None) must count
    its GTs as misses for the ICP metric too — excluding them would compute
    adds_auc_icp over an easier population than adds_auc."""
    ev = make_eval()
    # frame 1: detection + perfect ICP
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    poses = np.array([_pose(IDQ, [0.08, 0, 1.0])])
    poses_icp = np.array([_pose(IDQ, [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls,
                 poses_refined=poses, poses_icp=poses_icp)
    # frame 2: same GT, zero detections -> no poses_icp available
    ev.add_frame(LABELS, LABELS, np.zeros((0, 7), np.float32), None, gt, cls)
    s = ev.summary()
    # 1 perfect + 1 miss out of 2: ICP AUC must be 0.5, not 1.0
    assert s["adds_auc_icp"] == pytest.approx(0.5)
    assert s["pose_accuracy_icp"]["box"] == pytest.approx(0.5)


def test_add_frame_accepts_rois_without_poses():
    ev = make_eval()
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    ev.add_frame(LABELS, LABELS, rois, None, gt, cls)  # no poses: all GTs miss
    assert ev.pose_errors[1][0]["err"] == ev.MISS


def test_reprojection_metric_and_zflip():
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    ev = make_eval(flip_z_classes=["box"])
    gt, cls = _gt([[0, 0, 1.0]], [1])
    rois = np.array([_roi(1, 0.9)], np.float32)
    # 180-deg z-rotated estimate: raw reproj error is large, but the z-flip
    # correction makes it exact for the flip-symmetric evaluation
    Rz = np.diag([-1.0, -1.0, 1.0])
    poses = np.array([_pose(mat2quat(Rz), [0, 0, 1.0])])
    ev.add_frame(LABELS, LABELS, rois, poses, gt, cls, intrinsic_matrix=K)
    rec = ev.pose_errors[1][0]
    assert rec["reproj"] == pytest.approx(0.0, abs=1e-4)
    assert "reproj_accuracy" in ev.summary()


def test_segmentation_hist_still_accumulates():
    ev = make_eval()
    pred = np.array([[0, 1], [1, 1]])
    gt_l = np.array([[0, 1], [1, 2]])
    ev.add_frame(pred, gt_l)
    iou = ev.segmentation_iou()
    assert iou["box"] == pytest.approx(2 / 3)
