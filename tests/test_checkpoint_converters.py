"""Weight-converter tests: vgg16.npy dict and TF1 .ckpt -> param pytree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posecnn_tpu.core.checkpoint import load_tf1_checkpoint, load_vgg16_npy
from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params


def _small_cfg(input_format="COLOR"):
    return PoseCNNConfig(
        num_classes=3, num_units=8, input_format=input_format, vertex_reg=False,
        pose_reg=False, is_train=False, compute_dtype=jnp.float32, fc_dim=16,
    )


def test_vgg16_npy_converter_merges_and_duplicates(tmp_path):
    """npy dict entries land in the matching conv slots, including the `_p`
    dual-tower duplication (Network.load, lib/networks/network.py:71-107)."""
    cfg = _small_cfg("RGBD")
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 3, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    npy = {"conv1_1": {"weights": w, "biases": b}}
    path = tmp_path / "vgg16.npy"
    np.save(path, npy, allow_pickle=True)

    merged = load_vgg16_npy(str(path), params, log=None)
    np.testing.assert_allclose(np.asarray(merged["conv1_1"]["weights"]), w)
    np.testing.assert_allclose(np.asarray(merged["conv1_1_p"]["weights"]), w)
    np.testing.assert_allclose(np.asarray(merged["conv1_1_p"]["biases"]), b)
    # untouched slots keep their init
    np.testing.assert_allclose(
        np.asarray(merged["conv2_1"]["weights"]), np.asarray(params["conv2_1"]["weights"])
    )


def test_tf1_checkpoint_converter_roundtrip(tmp_path):
    """Write a real TF1 Saver checkpoint (variable_scope names) and read it
    back; Momentum slots / global_step must be skipped (train.py:58-91)."""
    tf = pytest.importorskip("tensorflow").compat.v1
    tf.disable_eager_execution()

    cfg = _small_cfg()
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 3, 64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)

    graph = tf.Graph()
    with graph.as_default():
        with tf.variable_scope("conv1_1"):
            tf.get_variable("weights", initializer=w)
            tf.get_variable("biases", initializer=b)
            tf.get_variable("weights/Momentum", initializer=np.ones_like(w) * 9.0)
        tf.get_variable("global_step", initializer=np.int64(123))
        saver = tf.train.Saver()
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            ckpt = str(tmp_path / "model.ckpt")
            saver.save(sess, ckpt)

    merged = load_tf1_checkpoint(ckpt, params, log=None)
    np.testing.assert_allclose(np.asarray(merged["conv1_1"]["weights"]), w)
    np.testing.assert_allclose(np.asarray(merged["conv1_1"]["biases"]), b)
    # momentum slot must NOT have been written anywhere
    assert not np.allclose(np.asarray(merged["conv1_1"]["weights"]), 9.0)


def test_npz_and_orbax_checkpoint_formats(tmp_path):
    """Both snapshot formats round-trip; npz light checkpoints keep fresh
    optimizer state; latest_checkpoint sees both layouts."""
    import jax.numpy as jnp
    import numpy as np

    from posecnn_tpu.core.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"conv": {"weights": jnp.arange(6.0).reshape(2, 3), "biases": jnp.ones(3)}}
    opt = {"trace": {"conv": {"weights": jnp.zeros((2, 3)), "biases": jnp.zeros(3)}}}
    state = (params, opt, jnp.asarray(7, jnp.int32))

    p1 = save_checkpoint(str(tmp_path), state, step=10, prefix="t", fmt="npz")
    assert p1.endswith(".npz")
    fresh = (
        {"conv": {"weights": jnp.zeros((2, 3)), "biases": jnp.zeros(3)}},
        {"trace": {"conv": {"weights": jnp.full((2, 3), 5.0), "biases": jnp.zeros(3)}}},
        jnp.asarray(0, jnp.int32),
    )
    r = restore_checkpoint(p1, fresh)
    np.testing.assert_allclose(np.asarray(r[0]["conv"]["weights"]), np.arange(6.0).reshape(2, 3))
    assert int(r[2]) == 7

    # light npz: opt_state absent -> fresh optimizer state preserved
    p2 = save_checkpoint(str(tmp_path), state, step=20, prefix="t", fmt="npz", include_opt_state=False)
    r2 = restore_checkpoint(p2, fresh)
    np.testing.assert_allclose(np.asarray(r2[1]["trace"]["conv"]["weights"]), 5.0)

    assert latest_checkpoint(str(tmp_path), prefix="t").endswith("t_iter_20.npz")

    p3 = save_checkpoint(str(tmp_path), state, step=30, prefix="t", fmt="orbax")
    r3 = restore_checkpoint(p3, fresh)
    np.testing.assert_allclose(np.asarray(r3[0]["conv"]["biases"]), 1.0)
    assert latest_checkpoint(str(tmp_path), prefix="t").rstrip("/").endswith("t_iter_30")


def test_reference_ckpt_parity_harness(tmp_path):
    """Full released-variable-inventory round trip (round-3 verdict task 9):
    fabricate a TF1 checkpoint with the EXACT released flagship variable set
    (all vgg16_convs.py scopes incl. the `upscore*` fixed deconvs, plus the
    global_step / Variable / Momentum slots train.py:58-91 skips), convert,
    and require 100% coverage with the skip-slots untouched."""
    pytest.importorskip("tensorflow")
    import importlib.util
    import os
    import sys

    tools = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    sys.path.insert(0, os.path.abspath(tools))
    spec = importlib.util.spec_from_file_location(
        "convert_reference_ckpt",
        os.path.join(tools, "convert_reference_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # small flagship-shaped tree to keep the test fast; the variable NAME
    # inventory (scopes + leaves + momentum/skip slots) is identical to the
    # full 22-class graph
    cfg = mod.flagship_cfg(num_classes=4, num_units=8)
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)

    expected = mod.expected_reference_variables(params)
    # the released graph's scope inventory, spot-pinned
    scopes = {v.split("/")[0] for v in expected}
    assert {"conv1_1", "conv5_3", "score", "score_conv4", "score_conv5",
            "upscore", "upscore_conv5", "upscore_conv5_vertex",
            "upscore_vertex", "vertex_pred", "score_conv4_vertex",
            "score_conv5_vertex", "fc6", "fc7", "fc8"} <= scopes
    # fixed bilinear deconvs carry no biases in the released file
    assert "upscore/weights" in expected and "upscore/biases" not in expected

    ckpt, values = mod.fabricate_reference_ckpt(str(tmp_path), params)
    merged, report = mod.convert(ckpt, params)
    assert report["ok"], report
    assert report["n_restored"] == report["n_expected"] == len(expected)
    assert not report["missing_in_ckpt"] and not report["shape_mismatch"]
    # every restored tensor equals the fabricated value bit-for-bit
    for name in expected:
        scope, leaf = name.split("/")
        np.testing.assert_array_equal(
            np.asarray(merged[scope][leaf]), values[name])
    # skip-slots were recognized and not written anywhere
    skipped = set(report["skipped_ckpt_vars"])
    assert "global_step" in skipped and "Variable" in skipped
    assert any("Momentum" in s for s in skipped)


def test_reference_ckpt_harness_flags_missing_and_mismatch(tmp_path):
    """The coverage report must FAIL (ok=False) on a checkpoint that is
    missing an expected variable or carries a wrong-shaped one."""
    tf1 = pytest.importorskip("tensorflow").compat.v1
    tf1.disable_eager_execution()
    import importlib.util
    import os
    import sys

    tools = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    sys.path.insert(0, os.path.abspath(tools))
    spec = importlib.util.spec_from_file_location(
        "convert_reference_ckpt2",
        os.path.join(tools, "convert_reference_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = mod.flagship_cfg(num_classes=4, num_units=8)
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)

    graph = tf1.Graph()
    with graph.as_default():
        with tf1.variable_scope("conv1_1"):
            # wrong shape: released conv1_1/weights is (3,3,3,64)
            tf1.get_variable("weights",
                             initializer=np.zeros((1, 1, 3, 64), np.float32))
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "bad.ckpt"))

    _, report = mod.convert(ckpt, params)
    assert not report["ok"]
    assert report["shape_mismatch"] and report["missing_in_ckpt"]
