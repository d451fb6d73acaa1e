"""Mesh file loaders (.obj/.ply) for the synthesizer (reference loads
textured models in synthesize.cpp; we rasterize them natively)."""

import numpy as np
import pytest

from posecnn_tpu.data.synthetic import Mesh

OBJ = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1 4/1/1
f -4 -3 -2
"""

PLY = """ply
format ascii 1.0
comment test
element vertex 4
property float x
property float y
property float z
property float nx
element face 3
property list uchar int vertex_indices
end_header
0 0 0 9
1 0 0 9
1 1 0 9
0 1 0 9
3 0 1 2
3 0 2 3
4 0 1 2 3
"""


def test_obj_loader(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    m = Mesh.from_obj(str(p))
    assert m.vertices.shape == (4, 3)
    # quad fan-triangulated to 2 + 1 negative-index triangle
    assert m.faces.shape == (3, 3)
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(m.faces[1], [0, 2, 3])
    np.testing.assert_array_equal(m.faces[2], [0, 1, 2])


def test_ply_loader(tmp_path):
    p = tmp_path / "m.ply"
    p.write_text(PLY)
    m = Mesh.from_ply(str(p))
    assert m.vertices.shape == (4, 3)
    np.testing.assert_allclose(m.vertices[2], [1, 1, 0])
    # 2 triangles + 1 fan-triangulated quad = 4
    assert m.faces.shape == (4, 3)


def test_load_dispatch(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    assert Mesh.load(str(p)).vertices.shape == (4, 3)
    with pytest.raises(ValueError):
        Mesh.load(str(tmp_path / "m.stl"))


def test_loaded_mesh_rasterizes(tmp_path):
    """A loaded mesh renders through the native/NumPy rasterizer."""
    from posecnn_tpu.native import SceneBuffers, rasterize_mesh

    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    m = Mesh.load(str(p))
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]], np.float32)
    buf = SceneBuffers(48, 64)
    pose = np.zeros((3, 4), np.float32)
    pose[:3, :3] = np.eye(3)
    pose[:, 3] = [-0.5, -0.5, 2.0]  # center the unit quad, push back
    rasterize_mesh(buf, m.vertices, m.faces, pose, K, cls_id=1)
    assert (buf.label == 1).sum() > 50


PLY_RGB = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 1
property list uchar int vertex_indices
end_header
0 0 0 255 0 0
1 0 0 0 255 0
0 1 0 0 0 255
3 0 1 2
"""


def test_ply_vertex_colors_ascii(tmp_path):
    p = tmp_path / "c.ply"
    p.write_text(PLY_RGB)
    m = Mesh.from_ply(str(p))
    assert m.colors is not None and m.colors.shape == (3, 3)
    np.testing.assert_allclose(m.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.colors[1], [0, 1, 0], atol=1e-6)


def _write_binary_ply(path, verts, colors, faces):
    import struct

    with open(path, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(b"element vertex %d\n" % len(verts))
        fh.write(
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        fh.write(b"element face %d\n" % len(faces))
        fh.write(b"property list uchar int vertex_indices\nend_header\n")
        for v, c in zip(verts, colors):
            fh.write(struct.pack("<fffBBB", *v, *c))
        for f in faces:
            fh.write(struct.pack("<Biii", 3, *f))


def test_ply_vertex_colors_binary(tmp_path):
    p = tmp_path / "b.ply"
    _write_binary_ply(
        p,
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)],
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 128, 128)],
        [(0, 1, 2), (0, 2, 3)],
    )
    m = Mesh.from_ply(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (2, 3)
    np.testing.assert_allclose(m.vertices[2], [1, 1, 0])
    np.testing.assert_allclose(m.colors[3], [128 / 255.0] * 3, atol=1e-6)


def test_vertex_color_interpolation():
    """Rasterized colors interpolate the vertex colors (not flat-filled).

    Lighting is neutralized (ambient=1, diffuse=0) so the test isolates
    interpolation; checks the native path and the NumPy fallback agree."""
    from posecnn_tpu.native import SceneBuffers, _rasterize_numpy, rasterize_mesh

    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
    K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)
    pose = np.concatenate([np.eye(3, dtype=np.float32), [[0], [0], [2.0]]], axis=1)
    light = (0.0, 0.0, -1.0, 1.0, 0.0)

    buf = SceneBuffers(48, 64)
    rasterize_mesh(buf, verts, faces, pose, K, 1, vertex_colors=colors, light=light)
    lab = buf.label == 1
    assert lab.sum() > 100
    # non-flat: many distinct colors across the object
    cols = buf.color[lab]
    assert len(np.unique(cols.view([("r", "u1"), ("g", "u1"), ("b", "u1")]))) > 50
    # corner pixels approach their vertex colors: bottom-left ~ red
    ys, xs = np.where(lab)
    bl = np.argmin(xs + ys)
    assert buf.color[ys[bl], xs[bl], 0] > 150 and buf.color[ys[bl], xs[bl], 2] < 100

    buf2 = SceneBuffers(48, 64)
    _rasterize_numpy(
        buf2, verts, faces, pose, K, 1, colors, np.ones(3, np.float32),
        np.asarray(light, np.float32),
    )
    inter = lab & (buf2.label == 1)
    diff = np.abs(
        buf.color[inter].astype(np.int32) - buf2.color[inter].astype(np.int32)
    )
    assert np.median(diff) <= 2  # same interpolation up to rounding


def test_light_direction_changes_shading():
    """Different light directions produce different renders of the same
    non-planar object (rotation becomes observable through shading)."""
    from posecnn_tpu.native import SceneBuffers, rasterize_mesh

    # a tetrahedron: faces with distinct normals
    verts = np.array(
        [[0, 0, 0.5], [0.5, 0, -0.2], [-0.3, 0.4, -0.2], [-0.3, -0.4, -0.2]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], np.int32)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    pose = np.concatenate([np.eye(3, dtype=np.float32), [[0], [0], [2.0]]], axis=1)

    imgs = []
    for light in [(0, 0, -1, 0.3, 0.7), (1, 0.5, 0.2, 0.3, 0.7)]:
        buf = SceneBuffers(48, 64)
        rasterize_mesh(buf, verts, faces, pose, K, 1, light=light)
        imgs.append(buf.color.astype(np.int32))
        assert (buf.label == 1).sum() > 50
    assert np.abs(imgs[0] - imgs[1]).max() > 20


def test_procedural_vertex_colors_deterministic():
    from posecnn_tpu.data.synthetic import procedural_vertex_colors

    rng = np.random.RandomState(0)
    verts = rng.randn(500, 3).astype(np.float32) * 0.05
    base = np.array([0.8, 0.2, 0.2], np.float32)
    c1 = procedural_vertex_colors(verts, 3, base)
    c2 = procedural_vertex_colors(verts, 3, base)
    np.testing.assert_array_equal(c1, c2)  # deterministic in cls_id
    c3 = procedural_vertex_colors(verts, 4, base)
    assert np.abs(c1 - c3).max() > 0.1  # differs across classes
    # genuinely non-flat over the surface
    assert c1.std(axis=0).max() > 0.05
    assert c1.min() >= 0.0 and c1.max() <= 1.0


def test_synthesizer_renders_textured_scene():
    """End-to-end: synthetic scenes are no longer flat per-class colors."""
    from posecnn_tpu.data.factory import get_imdb

    imdb = get_imdb("lov_syn_train")
    frame = imdb.load_frame(0)
    lab_classes = np.unique(frame.label)
    lab_classes = lab_classes[lab_classes > 0]
    assert len(lab_classes) >= 2
    for c in lab_classes:
        m = frame.label == c
        if m.sum() < 500:
            continue
        px = frame.color[m].astype(np.float32)
        # per-channel std across the object's pixels: flat rendering gives ~0
        assert px.std(axis=0).max() > 8.0, f"class {c} renders flat"


def test_frozen_val_snapshot(tmp_path):
    """freeze_dataset -> FrozenSyntheticDataset round-trip + tamper detection."""
    import json

    from posecnn_tpu.data.lov import lov
    from posecnn_tpu.data.synthetic import (
        FrozenSyntheticDataset,
        SyntheticDataset,
        freeze_dataset,
    )

    base = lov("train")
    live = SyntheticDataset(base, split="val", num_images=2)
    out = str(tmp_path / "snap")
    freeze_dataset(live, out)
    frozen = FrozenSyntheticDataset(base, out)
    f_live, f_frozen = live.load_frame(1), frozen.load_frame(1)
    np.testing.assert_array_equal(f_live.color, f_frozen.color)
    np.testing.assert_array_equal(f_live.label, f_frozen.label)
    np.testing.assert_allclose(f_live.poses, f_frozen.poses)

    # tampering with the manifest is detected loudly
    mpath = tmp_path / "snap" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["frames"][0] = "0" * 64
    mpath.write_text(json.dumps(m))
    bad = FrozenSyntheticDataset(base, out)
    with pytest.raises(RuntimeError, match="hash mismatch"):
        bad.load_frame(0)


def test_frozen_val_v4_registered():
    """The 256-frame headline val set (round-4 verdict: 64-frame v3 AUC
    deltas sit inside the noise floor) is registered, frozen, and serves
    a manifest-verified frame from its own held-out seed region."""
    from posecnn_tpu.data.factory import get_imdb

    imdb = get_imdb("lov_syn_val_v4")
    assert imdb.num_images == 256
    f = imdb.load_frame(200)  # beyond v3's 64 — genuinely new frames
    assert f.color.shape == (480, 640, 3)
    assert f.cls_indexes.shape[0] == f.poses.shape[2] == f.center.shape[0]


def test_render_scene_fallthrough_drops_undervisible_gt():
    """A frame that exhausts max_tries must not carry GT supervision for
    under-visible objects (verdict r3 task 6): the reference resamples until
    every object passes the 800-px gate (synthesize.cpp:448-452); the bounded
    fall-through here strips failing objects from cls_indexes/poses/centers
    AND re-labels their pixels background."""
    from posecnn_tpu.data.synthetic import build_ycb_synthesizer
    from posecnn_tpu.data.toy import toy

    ds = toy("train", num_classes=4, num_images=4, height=96, width=128)
    syn = build_ycb_synthesizer(
        ds, width=128, height=96, min_objects=2, max_objects=3, min_visible=1
    )
    base = syn.render_scene(np.random.RandomState(7), max_tries=1)
    counts = {int(c): int((base.label == int(c)).sum())
              for c in base.cls_indexes}
    assert len(counts) >= 2 and min(counts.values()) < max(counts.values())

    # threshold chosen to split the visible-pixel counts of this exact scene
    gate = min(counts.values()) + 1
    syn.min_visible = gate
    fr = syn.render_scene(np.random.RandomState(7), max_tries=1)

    kept = {int(c) for c in fr.cls_indexes}
    dropped = {c for c, n in counts.items() if n < gate}
    assert dropped and kept == set(counts) - dropped
    for c in dropped:
        assert (fr.label == c).sum() == 0, "dropped object left label pixels"
    # GT arrays stay mutually consistent
    assert fr.poses.shape[2] == len(kept) == fr.center.shape[0]
    for j, c in enumerate(fr.cls_indexes.astype(int)):
        assert counts[c] >= gate
    # appearance/label consistency (advisor r4): the scene is RE-RENDERED
    # from the kept set, so a dropped object's rendered surface must not
    # linger in color/depth under background labels — background pixels
    # carry no geometry at all
    assert int(fr.depth[fr.label == 0].max()) == 0, \
        "dropped object left depth under background labels"

    # all-dropped frame: zero GT rows, all-background label, blank image
    syn.min_visible = 10 ** 9
    fr0 = syn.render_scene(np.random.RandomState(7), max_tries=1)
    assert fr0.cls_indexes.shape == (0,)
    assert fr0.poses.shape == (3, 4, 0) and fr0.center.shape == (0, 2)
    assert int(fr0.label.max()) == 0
    assert int(fr0.depth.max()) == 0 and int(fr0.color.max()) == 0
