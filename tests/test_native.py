"""Native C++ runtime components: OBJ parser, RLE and PNG encoders vs Python."""

import numpy as np
import pytest

from torch_renderer_tpu.io.native import native_available, parse_obj_bytes, rle_encode

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (no g++)"
)


OBJ_TEXT = b"""
# test mesh
mtllib thing.mtl
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.5
v 0.0 1.0 -0.5
vt 0.0 0.0
vt 1.0 0.0
vt 1.0 1.0
vt 0.0 1.0
vn 0.0 0.0 1.0
f 1/1/1 2/2/1 3/3/1 4/4/1
f 1//1 3//1 4//1
f -4 -3 -2
"""


def test_parse_obj_counts_and_values():
    out = parse_obj_bytes(OBJ_TEXT)
    assert out is not None
    np.testing.assert_allclose(
        out["verts"],
        [[0, 0, 0], [1, 0, 0], [1, 1, 0.5], [0, 1, -0.5]], atol=1e-6,
    )
    assert out["uvs"].shape == (4, 2)
    assert out["normals"].shape == (1, 3)
    # quad fan (2 tris) + 2 more faces
    assert out["faces"].shape == (4, 3)
    np.testing.assert_array_equal(out["faces"][0], [0, 1, 2])
    np.testing.assert_array_equal(out["faces"][1], [0, 2, 3])
    np.testing.assert_array_equal(out["faces"][3], [0, 1, 2])  # negative idx
    # v//n corners have uv = -1
    assert (out["faces_uv"][2] == -1).all()
    assert (out["faces_uv"][0] >= 0).all()


def test_parse_matches_python_loader(tmp_path):
    from torch_renderer_tpu.io import obj as obj_mod
    from torch_renderer_tpu.ops.icosphere import icosphere

    verts, faces = icosphere(2)
    p = tmp_path / "ico.obj"
    obj_mod.save_obj(str(p), verts, faces)

    native = parse_obj_bytes(p.read_bytes())
    np.testing.assert_allclose(native["verts"], verts, atol=1e-5)
    np.testing.assert_array_equal(native["faces"], faces)

    # and through the public load_obj (which prefers the native path)
    loaded = obj_mod.load_obj(str(p), load_textures=False)
    np.testing.assert_allclose(loaded.verts, verts, atol=1e-5)
    np.testing.assert_array_equal(loaded.faces, faces)


def test_scientific_notation_and_whitespace():
    out = parse_obj_bytes(b"v 1.5e-2 -2E1 +0.25\nv\t1 2 3\nf 1 2 1\n")
    np.testing.assert_allclose(out["verts"][0], [0.015, -20.0, 0.25], rtol=1e-5)


def test_rle_matches_numpy_reference():
    rng = np.random.default_rng(0)
    mask = rng.uniform(size=(37, 53)) > 0.6

    got = rle_encode(mask)
    # numpy reference (the datagen fallback implementation)
    flat = mask.astype(np.uint8).flatten(order="F")
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]])).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    assert got["counts"] == runs
    assert got["size"] == [37, 53]
    assert sum(got["counts"]) == 37 * 53


def test_rle_empty_and_full():
    assert rle_encode(np.zeros((4, 5), bool))["counts"] == [20]
    assert rle_encode(np.ones((4, 5), bool))["counts"] == [0, 20]


def test_png_write_roundtrip(tmp_path):
    """Native PNG encoder output decodes bit-exactly (PIL as the reader
    oracle) for gray, RGB and RGBA."""
    pytest.importorskip("PIL")
    from PIL import Image

    from torch_renderer_tpu.io.native import native_available, png_write

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for shape in ((37, 53), (37, 53, 3), (16, 24, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        p = str(tmp_path / f"t{len(shape)}_{shape[-1]}.png")
        assert png_write(p, img)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back.reshape(img.shape), img)


def test_png_write_rejects_bad_input(tmp_path):
    from torch_renderer_tpu.io.native import native_available, png_write

    if not native_available():
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError):
        png_write(str(tmp_path / "x.png"), np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        png_write(str(tmp_path / "x.png"), np.zeros((4, 4, 2), np.uint8))
