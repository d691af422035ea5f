"""OBJ IO: texture-atlas round trip (create_texture_image parity with
ref:third_party/softras/soft_renderer/functional/save_obj.py:9-36 and
cuda/create_texture_image_cuda_kernel.cu).
"""

import numpy as np

from lasr_tpu.utils import obj as obj_io


def test_create_texture_image_shapes():
    F, R = 7, 4
    tex = np.random.RandomState(0).rand(F, R * R, 3).astype(np.float32)
    img, uvs = obj_io.create_texture_image(tex, texture_res=8)
    tile_w = int((F - 1.0) ** 0.5) + 1          # 3
    tile_h = int((F - 1.0) / tile_w) + 1        # 3
    assert img.shape == (tile_h * 8, tile_w * 8, 3)
    assert uvs.shape == (F, 3, 2)
    assert uvs.min() >= 0 and uvs.max() <= 1
    # unused tiles stay background white
    assert img.max() <= 1.0


def test_save_obj_surface_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    verts = rng.randn(5, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]], np.int64)
    # constant color per face -> atlas sampling must reproduce it exactly
    tex = np.repeat(rng.rand(3, 1, 3), 25, axis=1).astype(np.float32)

    path = str(tmp_path / "m.obj")
    obj_io.save_obj(path, verts, faces, textures=tex, texture_res=16,
                    texture_type="surface")

    v2, f2, uv, fuv, img = obj_io.load_obj(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    assert img is not None and uv is not None
    baked = obj_io.bake_face_textures(uv, fuv, img, res=5)
    got = baked.reshape(3, -1, 3).mean(1)
    want = tex[:, 0]
    np.testing.assert_allclose(got, want, atol=0.02)


def test_save_obj_vertex_colors(tmp_path):
    verts = np.eye(3, dtype=np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    path = str(tmp_path / "vc.obj")
    obj_io.save_obj(path, verts, faces, textures=colors,
                    texture_type="vertex")
    txt = open(path).read()
    assert "v 1.00000000 0.00000000 0.00000000 1.00000000 0.00000000 0.00000000" in txt
    assert "f 1 2 3" in txt
