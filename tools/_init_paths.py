"""Add the repo root to sys.path so `posecnn_tpu` imports from a checkout
(reference: tools/_init_paths.py)."""

import os.path as osp
import sys

repo_root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)
