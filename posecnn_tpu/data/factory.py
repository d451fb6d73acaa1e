"""Dataset factory (lib/datasets/factory.py): name -> constructor registry."""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, ctor: Callable):
    _REGISTRY[name] = ctor


def get_imdb(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"Unknown dataset: {name}. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def list_imdbs():
    return sorted(_REGISTRY)


def _install_defaults():
    from posecnn_tpu.data.lov import lov
    from posecnn_tpu.data.toy import toy

    for split in ("train", "val", "keyframe", "trainval", "debug", "train_few", "val_few"):
        register(f"lov_{split}", lambda s=split: lov(s))
    for split in ("train", "val"):
        register(f"toy_{split}", lambda s=split: toy(s))
    from posecnn_tpu.data.linemod import linemod

    # reference registry splits: train/test/train_few/test_few
    # (lib/datasets/factory.py:94-101)
    for cls in linemod.LINEMOD_CLASSES[1:]:
        for split in ("train", "test", "train_few", "test_few"):
            register(f"linemod_{cls}_{split}", lambda c=cls, s=split: linemod(c, s))

    def _lov_syn(split):
        import os

        from posecnn_tpu.data.synthetic import FrozenSyntheticDataset, SyntheticDataset

        # both splits serve from a frozen on-disk snapshot when present
        # (hash-pinned by a manifest — see freeze_dataset): the val manifest
        # is committed so renderer changes can never silently move the
        # accuracy benchmark; the train snapshot (not committed, regenerable)
        # amortizes the ~0.4 s/frame render cost across training restarts
        here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        snap = os.path.join(
            here, "data",
            "lov_syn_val_v3" if split == "val" else "lov_syn_train_frozen",
        )
        if os.path.exists(os.path.join(snap, "manifest.json")):
            return FrozenSyntheticDataset(lov("train"), snap)
        n = 2000 if split == "train" else 64
        return SyntheticDataset(lov("train"), split=split, num_images=n)

    for split in ("train", "val"):
        register(f"lov_syn_{split}", lambda s=split: _lov_syn(s))

    def _lov_syn_val_v4():
        import os

        from posecnn_tpu.data.synthetic import FrozenSyntheticDataset

        # 256-frame headline val set (round-4 verdict: the 64-frame v3's
        # ~284-detection population puts AUC deltas of ~0.002 inside the
        # noise floor); same held-out seed region as v3 (val seed0
        # 10_000_000), frozen by tools/freeze_dataset.py --num 256
        here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        snap = os.path.join(here, "data", "lov_syn_val_v4")
        return FrozenSyntheticDataset(lov("train"), snap)

    register("lov_syn_val_v4", _lov_syn_val_v4)

    from posecnn_tpu.data import variants

    for split in ("train", "val", "trainval", "keyframe"):
        register(f"ycb_{split}", lambda s=split: variants.ycb(s))
    for scene in ("rgbd_scene", "shapenet_scene", "shapenet_single", "gmu_scene", "yumi", "sym"):
        for split in ("train", "val", "trainval"):
            register(f"{scene}_{split}", lambda sc=scene, s=split: getattr(variants, sc)(s))
    from posecnn_tpu.data.lov import YCB_CLASSES

    for cls in YCB_CLASSES[1:]:
        for split in ("train", "val"):
            register(f"lov_single_{cls}_{split}", lambda c=cls, s=split: variants.lov_single(c, s))
            register(f"ycb_single_{cls}_{split}", lambda c=cls, s=split: variants.ycb_single(c, s))


_install_defaults()
