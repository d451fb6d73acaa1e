"""CLI routing for the segmentation-only variants (round-2 verdict task 5).

The reference factory serves every variant (lib/networks/factory.py:47-51);
a `NETWORK: RESNET50` / `FCN8VGG` config must actually train/evaluate that
variant instead of silently running vgg16_convs. These tests drive the same
entry points the CLIs call (tools/train_net.py:train_segmentation,
tools/test_net.py segmentation branch) on the toy dataset.
"""

import argparse
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from posecnn_tpu.core.config import Config
from posecnn_tpu.data.factory import get_imdb


def _tiny_cfg():
    cfg = Config()
    cfg.TRAIN.IMS_PER_BATCH = 2
    cfg.TRAIN.DISPLAY = 1
    cfg.TRAIN.SNAPSHOT_ITERS = 100
    cfg.TRAIN.CHROMATIC = False
    cfg.TRAIN.ADD_NOISE = False
    return cfg


@pytest.mark.parametrize("name", ["resnet50", "fcn8_vgg"])
def test_variant_smoke_train_and_eval(tmp_path, name):
    import train_net as train_cli

    cfg = _tiny_cfg()
    imdb = get_imdb("toy_train")
    args = argparse.Namespace(max_iters=2, output=str(tmp_path))
    train_cli.train_segmentation(args, cfg, imdb, name)
    snaps = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert snaps, "training must write a snapshot"

    # eval path: variant forward -> label IoU
    from posecnn_tpu.data.imdb import PoseEvaluator
    from posecnn_tpu.engine.test import test_net_segmentation
    from posecnn_tpu.models.factory import get_network

    init_fn, fwd = get_network(name)
    C = imdb.num_classes
    params = init_fn(jax.random.PRNGKey(0), C)
    ev = PoseEvaluator(imdb.classes, imdb._extents, imdb._points, [])
    test_net_segmentation(
        params, lambda p, d: fwd(p, d, C), imdb, cfg.pixel_means(),
        evaluator=ev, max_frames=2, log=None,
    )
    s = ev.summary()
    assert np.isfinite(s["mean_iou"])


def test_cli_network_dispatch_names():
    """The train CLI's dispatch recognizes every factory variant name the
    reference CLIs accept (guards against silently training vgg16_convs)."""
    from posecnn_tpu.models.factory import list_networks

    known = set(list_networks())
    for required in ("vgg16_convs", "vgg16_full", "vgg16_det", "resnet50",
                     "fcn8_vgg", "vgg16", "vgg16_gan", "dcgan"):
        assert required in known
