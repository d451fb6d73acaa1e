"""Every generated experiment YAML must load through the strict merge, and
every experiment script must reference an existing config and a registered
dataset split."""

import glob
import os
import re

import pytest

from posecnn_tpu.core.config import cfg_fresh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = sorted(glob.glob(os.path.join(REPO, "experiments", "cfgs", "*.yml")))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "experiments", "scripts", "*.sh")))


def test_configs_exist():
    assert len(CFGS) >= 80, len(CFGS)
    assert len(SCRIPTS) >= 160, len(SCRIPTS)


@pytest.mark.parametrize("path", CFGS, ids=[os.path.basename(p) for p in CFGS])
def test_config_loads(path):
    cfg = cfg_fresh(path)
    assert cfg.TRAIN.NUM_CLASSES >= 2
    assert cfg.INPUT in ("COLOR", "DEPTH", "RGBD", "NORMAL")
    assert cfg.NETWORK in (
        "VGG16", "VGG16FULL", "VGG16DET", "VGG16GAN", "DCGAN", "RESNET50", "FCN8VGG"
    )


def test_scripts_reference_real_configs_and_imdbs():
    from posecnn_tpu.data.factory import list_imdbs

    known = set(list_imdbs())
    cfg_names = {os.path.splitext(os.path.basename(p))[0] for p in CFGS}
    for path in SCRIPTS:
        text = open(path).read()
        for m in re.finditer(r"experiments/cfgs/(\S+)\.yml", text):
            assert m.group(1) in cfg_names, (path, m.group(1))
        for m in re.finditer(r"--imdb (\S+)", text):
            assert m.group(1) in known, (path, m.group(1))
