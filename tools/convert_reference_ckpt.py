#!/usr/bin/env python
"""Released-checkpoint parity harness (round-3 verdict task 9).

The released PoseCNN demo model is a TF1 Saver checkpoint
(`vgg16_fcn_color_single_frame_2d_pose_add_lov_iter_160000.ckpt`,
reference experiments/scripts/demo.sh:12). It is not present in this
environment, so this tool makes parity a one-command check for the day it
is: it knows the EXACT variable inventory of the released flagship graph
(reference lib/networks/vgg16_convs.py setup(): 13 VGG convs, 2+1 score
convs, 4 fixed bilinear deconvs, the vertex head, fc6/fc7/fc8 — every
scope holds `weights` [+ `biases` for trainable ops], plus global_step /
bare `Variable` / `<var>/Momentum` slots that SolverWrapper.restore skips,
reference lib/fcn/train.py:58-91), and the name map to this repo's param
pytree is the identity on scopes (init_posecnn_params mirrors the
reference scope names; fc kernels share TF's [num_in, num_out] layout and
convs share HWIO, so conversion is assignment, not transposition).

Modes:
  --ckpt PATH     convert a real TF1 checkpoint; report per-variable
                  status and target-slot coverage; exit nonzero unless
                  every expected reference variable landed
  --fabricate DIR no released file available: write a TF1 checkpoint with
                  the exact released variable names/shapes (random values
                  + the skip-slots), then run the same conversion against
                  it — an end-to-end dry run of the parity pipeline
  --out PATH.npz  save the converted params (loadable by tools/test_net.py
                  --model / tools/demo.py)
"""

import argparse
import json
import sys

import numpy as np

import _init_paths  # noqa: F401


def flagship_cfg(num_classes=22, num_units=64, input_format="COLOR"):
    import jax.numpy as jnp

    from posecnn_tpu.models.posecnn import PoseCNNConfig

    return PoseCNNConfig(
        num_classes=num_classes, num_units=num_units,
        input_format=input_format, vertex_reg=True, pose_reg=True,
        is_train=False, compute_dtype=jnp.float32,
    )


def expected_reference_variables(params):
    """The released graph's variable set, in TF1 `scope/name` form.

    Identity map onto the param pytree: every scope/leaf of the flagship
    tree exists in the released graph under the same name (vgg16_convs.py
    setup()); the released file additionally holds `global_step`, a bare
    `Variable`, and one `/Momentum` slot per trainable variable, all of
    which the converter must skip.
    """
    return sorted(
        f"{scope}/{leaf}" for scope, leaves in params.items()
        for leaf in leaves
    )


def fabricate_reference_ckpt(out_dir, params):
    """TF1 Saver checkpoint with the released graph's exact variable set."""
    import tensorflow as _tf

    tf = _tf.compat.v1
    tf.disable_eager_execution()
    rng = np.random.RandomState(0)
    graph = tf.Graph()
    values = {}
    with graph.as_default():
        for scope, leaves in sorted(params.items()):
            with tf.variable_scope(scope):
                for leaf, ref in sorted(leaves.items()):
                    v = rng.randn(*ref.shape).astype(np.float32) * 0.01
                    values[f"{scope}/{leaf}"] = v
                    tf.get_variable(leaf, initializer=v)
                    # trainable ops carry Momentum slots in the released
                    # file (MomentumOptimizer); deconvs are trainable=False
                    # and carry none (network.py:208-223)
                    if not scope.startswith("upscore"):
                        tf.get_variable(f"{leaf}/Momentum",
                                        initializer=np.zeros_like(v))
        tf.get_variable("global_step", initializer=np.int64(160000))
        tf.get_variable("Variable", initializer=np.float32(0.0))
        saver = tf.train.Saver()
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            path = saver.save(sess, f"{out_dir}/model.ckpt")
    return path, values


def convert(ckpt_path, params, log=print):
    """load_tf1_checkpoint + a full coverage report against the expected
    released variable inventory."""
    import tensorflow as tf

    from posecnn_tpu.core.checkpoint import load_tf1_checkpoint

    reader = tf.train.load_checkpoint(ckpt_path)
    present = set(reader.get_variable_to_shape_map())
    expected = expected_reference_variables(params)

    merged = load_tf1_checkpoint(ckpt_path, params, log=None)

    report = {"ckpt": ckpt_path, "restored": [], "missing_in_ckpt": [],
              "shape_mismatch": [], "skipped_ckpt_vars": []}
    for name in expected:
        scope, leaf = name.split("/")
        if name not in present:
            report["missing_in_ckpt"].append(name)
            continue
        want = tuple(params[scope][leaf].shape)
        got = tuple(reader.get_variable_to_shape_map()[name])
        if want != got:
            report["shape_mismatch"].append(
                {"var": name, "ckpt": list(got), "target": list(want)})
            continue
        # verify the merge actually wrote the checkpoint value
        if not np.allclose(np.asarray(merged[scope][leaf]),
                           reader.get_tensor(name)):
            report["shape_mismatch"].append(
                {"var": name, "error": "value not written by converter"})
            continue
        report["restored"].append(name)
    for name in sorted(present - set(expected)):
        report["skipped_ckpt_vars"].append(name)

    ok = not report["missing_in_ckpt"] and not report["shape_mismatch"]
    report["ok"] = ok
    report["n_restored"] = len(report["restored"])
    report["n_expected"] = len(expected)
    return merged, report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="real released TF1 checkpoint")
    ap.add_argument("--fabricate",
                    help="dir: fabricate a released-shaped ckpt and dry-run")
    ap.add_argument("--out", help="write converted params as npz")
    ap.add_argument("--report", help="write the coverage report json")
    ap.add_argument("--num-classes", type=int, default=22)
    ap.add_argument("--num-units", type=int, default=64)
    ap.add_argument("--input-format", default="COLOR")
    args = ap.parse_args()
    if bool(args.ckpt) == bool(args.fabricate):
        ap.error("exactly one of --ckpt / --fabricate required")

    import jax

    from posecnn_tpu.models.posecnn import init_posecnn_params

    cfg = flagship_cfg(args.num_classes, args.num_units, args.input_format)
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)

    ckpt = args.ckpt
    if args.fabricate:
        ckpt, _ = fabricate_reference_ckpt(args.fabricate, params)
        print(f"fabricated released-shaped checkpoint: {ckpt}")

    merged, report = convert(ckpt, params)
    print(f"restored {report['n_restored']}/{report['n_expected']} expected "
          f"variables; skipped {len(report['skipped_ckpt_vars'])} "
          f"optimizer/step slots")
    for k in ("missing_in_ckpt", "shape_mismatch"):
        for item in report[k]:
            print(f"  {k}: {item}")
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=1)
    if args.out:
        # the repo's native npz snapshot layout (core/checkpoint.py
        # _flatten_state), so the artifact loads via restore_checkpoint /
        # tools/test_net.py --model / tools/demo.py
        import jax.numpy as jnp

        from posecnn_tpu.core.checkpoint import _flatten_state

        payload = {"params": merged, "step": jnp.asarray(160000, jnp.int32)}
        np.savez(args.out, **_flatten_state(payload))
        print(f"wrote {args.out}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
