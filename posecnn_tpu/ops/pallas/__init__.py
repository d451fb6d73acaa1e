"""Pallas TPU kernels for the hot non-conv ops.

Each kernel ships with a pure-JAX reference path (used on CPU and in golden
tests); the compiled kernel is selected automatically on TPU backends.
"""

from posecnn_tpu.ops.pallas.voting import accumulate_votes_slots  # noqa: F401
