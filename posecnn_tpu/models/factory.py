"""Network factory (lib/networks/factory.py): name -> (init_fn, forward_fn).

Names mirror the reference registry: vgg16_convs (PoseCNN), vgg16_full,
vgg16_det (detection), vgg16 (video GRU), vgg16_gan, dcgan, resnet50,
fcn8_vgg.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str, init_fn: Callable, forward_fn: Callable):
    _REGISTRY[name] = (init_fn, forward_fn)


def get_network(name: str) -> Tuple[Callable, Callable]:
    if name not in _REGISTRY:
        raise KeyError(f"Unknown network: {name}. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_networks():
    return sorted(_REGISTRY)


def _install():
    from posecnn_tpu.models.fcn8 import fcn8_forward, init_fcn8_params
    from posecnn_tpu.models.gan import (
        dcgan_generator,
        init_dcgan_params,
        init_vgg16_gan_params,
        vgg16_gan_forward,
    )
    from posecnn_tpu.models.posecnn import init_posecnn_params, posecnn_forward
    from posecnn_tpu.models.posecnn_full import init_posecnn_full_params, posecnn_full_forward
    from posecnn_tpu.models.resnet50 import init_resnet50_params, resnet50_forward
    from posecnn_tpu.models.video import init_video_params, video_forward

    register("vgg16_convs", init_posecnn_params, posecnn_forward)
    register("vgg16_full", init_posecnn_full_params, posecnn_full_forward)
    register("vgg16", init_video_params, video_forward)
    register("resnet50", init_resnet50_params, resnet50_forward)
    register("fcn8_vgg", init_fcn8_params, fcn8_forward)
    register("dcgan", init_dcgan_params, dcgan_generator)
    register("vgg16_gan", init_vgg16_gan_params, vgg16_gan_forward)
    from posecnn_tpu.models.video import init_video3d_params, video3d_forward

    register("vgg16_3d", init_video3d_params, video3d_forward)
    try:
        from posecnn_tpu.models.detection import init_vgg16_det_params, vgg16_det_forward

        register("vgg16_det", init_vgg16_det_params, vgg16_det_forward)
    except ImportError:
        pass


_install()
