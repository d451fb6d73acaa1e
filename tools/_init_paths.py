"""Add the repo root to sys.path so `posecnn_tpu` imports from a checkout
(reference: tools/_init_paths.py), and enable the persistent XLA compile
cache — the full train-step compile is 40-240 s; cached reloads are seconds,
which matters for restart-heavy (preemptible) operation."""

import os
import os.path as osp
import sys

repo_root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_posecnn_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# the env vars alone are ignored by some jax builds (observed here: cache
# dir stayed empty across runs while the config-API path populated it) —
# set the config explicitly as soon as jax is imported
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
