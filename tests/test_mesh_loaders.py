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
