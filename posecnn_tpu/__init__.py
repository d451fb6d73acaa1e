"""posecnn_tpu — a TPU-native (JAX/XLA/Pallas) 6-DoF object pose estimation framework.

A ground-up rebuild of the capabilities of PoseCNN (Xiang et al., RSS 2018;
reference implementation: yuxng/PoseCNN, TF1 + custom CUDA ops) designed for
TPU hardware:

* the VGG16-FCN backbone and its three heads (semantic labels, center-direction
  /depth voting, quaternion regression) are pure JAX/XLA, jit-compiled with
  static shapes;
* the reference's custom CUDA ops (hough voting, hard label, RoI pooling,
  average-distance ADD/ADD-S loss, backprojection, flow warping, gradient
  reversal, embedding losses, NMS, normal estimation) are reimplemented as
  fixed-shape JAX ops and Pallas TPU kernels;
* training scales data-parallel over a `jax.sharding.Mesh` with XLA
  collectives over ICI (the reference is single-GPU only);
* host-side subsystems (dataset registry, minibatch synthesis, software
  renderer) run on CPU feeding double-buffered device batches.
"""

__version__ = "0.1.0"

import os as _os

# persistent XLA compilation cache: full-model TPU compiles take minutes in
# this environment; caching makes every process after the first start fast.
# Must be set before the first backend use (import order suffices).
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
