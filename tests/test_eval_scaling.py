"""TEST.SCALES_BASE input-rescale handling in the eval path.

Regression tests for the im_scale != 1.0 bugs: the x16 padding rows must be
cropped before the label map is resized back to the dataset frame, and the
VERTEX_REG_3D decode must see dataset-resolution maps (its depth and K are
unscaled). Before the fix the 3D branch crashed with a flat-size mismatch
and the 2D branch misaligned labels by the padding fraction.
"""

import jax
import numpy as np
import pytest

from posecnn_tpu.core.config import Config
from posecnn_tpu.data.factory import get_imdb
from posecnn_tpu.data.imdb import PoseEvaluator
from posecnn_tpu.engine.test import test_net as run_eval
from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params


def _model_cfg(**kw):
    base = dict(
        num_classes=3, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True,
        is_train=False, hough_class_slots=2, hough_max_samples=32,
        hough_center_stride=4, hough_refine_window=8, label_threshold=5,
        fc_dim=64, hough_sampler="approx", use_crop_pool=True,
    )
    base.update(kw)
    return PoseCNNConfig(**base)


def _evaluator(imdb):
    return PoseEvaluator(imdb.classes, imdb._extents, imdb._points, [])


@pytest.mark.parametrize("im_scale", [0.5])
def test_eval_at_half_scale_runs_and_aligns(im_scale):
    imdb = get_imdb("toy_val")
    cfg = _model_cfg()
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    pm = Config().pixel_means()

    ev1 = _evaluator(imdb)
    run_eval(params, cfg, imdb, pm, evaluator=ev1, max_frames=2, im_scale=1.0, log=None)
    ev2 = _evaluator(imdb)
    run_eval(params, cfg, imdb, pm, evaluator=ev2, max_frames=2, im_scale=im_scale, log=None)
    # the confusion histograms live at dataset resolution in both runs
    assert ev1.hist.sum() == ev2.hist.sum()
    # background-vs-foreground structure correlates across scales: the same
    # network on a 2x-downscaled input must not produce a wildly different
    # foreground fraction after the map is brought back to frame coordinates
    fg1 = 1.0 - ev1.hist[:, 0].sum() / ev1.hist.sum()
    fg2 = 1.0 - ev2.hist[:, 0].sum() / ev2.hist.sum()
    assert abs(fg1 - fg2) < 0.35


def test_eval_3d_at_half_scale_runs(tmp_path):
    """VERTEX_REG_3D + im_scale != 1: decode sees dataset-resolution maps
    (crashed with a flat-size mismatch before the fix)."""
    imdb = get_imdb("toy_val")
    cfg = _model_cfg(vertex_reg_3d=True, pose_reg=False)
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    ev = _evaluator(imdb)
    run_eval(
        params, cfg, imdb, Config().pixel_means(),
        evaluator=ev, max_frames=1, im_scale=0.5, log=None,
    )
    assert ev.hist.sum() > 0


def test_eval_batch_matches_single_frame():
    """eval_batch > 1 (throughput serving mode) must produce identical
    evaluator state to the per-frame path — hough slots and detections are
    per image, so batching only amortizes dispatch."""
    imdb = get_imdb("toy_val")
    cfg = _model_cfg()
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    pm = Config().pixel_means()

    ev1 = _evaluator(imdb)
    run_eval(params, cfg, imdb, pm, evaluator=ev1, max_frames=3, log=None)
    ev2 = _evaluator(imdb)
    run_eval(params, cfg, imdb, pm, evaluator=ev2, max_frames=3, eval_batch=2, log=None)
    np.testing.assert_array_equal(ev1.hist, ev2.hist)
    for c in range(imdb.num_classes):
        r1 = sorted(ev1.pose_errors[c], key=lambda r: r.get("err", 0))
        r2 = sorted(ev2.pose_errors[c], key=lambda r: r.get("err", 0))
        assert len(r1) == len(r2)
        for a, b in zip(r1, r2):
            for k in a:
                np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=f"class {c} key {k}")
