"""GLB scene export: container validity + geometry semantics.

No glTF library exists in this image (by design — the writer is
self-contained), so these tests parse the binary container with struct and
validate the JSON scene graph + buffer layout directly, the same
no-external-runtime discipline as the HTML-viewer tests."""
import json
import struct

import numpy as np
import pytest

from align3r_tpu.eval.glb import (GlbBuilder, export_scene_glb, CAM_COLORS)


def _parse_glb(path):
    with open(path, "rb") as f:
        raw = f.read()
    magic, version, total = struct.unpack_from("<4sII", raw, 0)
    assert magic == b"glTF" and version == 2 and total == len(raw)
    jlen, jtype = struct.unpack_from("<I4s", raw, 12)
    assert jtype == b"JSON" and jlen % 4 == 0
    gltf = json.loads(raw[20:20 + jlen])
    blen, btype = struct.unpack_from("<I4s", raw, 20 + jlen)
    assert btype == b"BIN\x00"
    bin_ = raw[28 + jlen:28 + jlen + blen]
    return gltf, bin_


def _check_layout(gltf, bin_):
    assert gltf["buffers"][0]["byteLength"] <= len(bin_)
    for v in gltf["bufferViews"]:
        assert v["byteOffset"] % 4 == 0
        assert v["byteOffset"] + v["byteLength"] <= len(bin_)
    sizes = {5126: 4, 5121: 1, 5125: 4}
    comps = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}
    for a in gltf["accessors"]:
        v = gltf["bufferViews"][a["bufferView"]]
        need = a["count"] * sizes[a["componentType"]] * comps[a["type"]]
        assert need <= v["byteLength"], (a, v)


def _scene_arrays(n=3, H=6, W=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, H, W, 3), np.float32)
    pts3d = rng.standard_normal((n, H, W, 3)).astype(np.float32) + \
        np.arange(n, dtype=np.float32)[:, None, None, None]
    masks = rng.random((n, H, W)) > 0.2
    focals = np.full(n, 40.0)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    poses[:, 0, 3] = np.arange(n)
    return imgs, pts3d, masks, focals, poses


@pytest.mark.parametrize("as_pc", [True, False])
def test_export_scene_glb_container(tmp_path, as_pc):
    imgs, pts3d, masks, focals, poses = _scene_arrays()
    path = str(tmp_path / "scene.glb")
    export_scene_glb(path, imgs, pts3d, masks, focals, poses,
                     as_pointcloud=as_pc)
    gltf, bin_ = _parse_glb(path)
    _check_layout(gltf, bin_)
    modes = [m["primitives"][0].get("mode", 4) for m in gltf["meshes"]]
    # scene geometry + 3 cams x (edges, textured plane)
    assert modes[0] == (0 if as_pc else 4)
    assert modes.count(1) == 3 and modes.count(4) == (3 if as_pc else 4)
    # point count == sum of masks for the pointcloud variant
    if as_pc:
        acc = gltf["accessors"][
            gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
        assert acc["count"] == int(masks.sum())
        assert "min" in acc and "max" in acc
    # textured planes embed JPEGs
    assert len(gltf["images"]) == 3
    for im in gltf["images"]:
        v = gltf["bufferViews"][im["bufferView"]]
        assert bin_[v["byteOffset"]:v["byteOffset"] + 2] == b"\xff\xd8"  # JPEG SOI
    # vertex colors are normalized VEC4 ubyte (stride-4 alignment rule)
    col = gltf["accessors"][
        gltf["meshes"][0]["primitives"][0]["attributes"]["COLOR_0"]]
    assert col["type"] == "VEC4" and col["normalized"] is True


def test_glb_world_orientation_and_frusta(tmp_path):
    """The export orients to the first camera (reference demo.py:100-130
    apply_transform): cam0's frustum apex must land at the origin."""
    imgs, pts3d, masks, focals, poses = _scene_arrays()
    path = str(tmp_path / "scene.glb")
    export_scene_glb(path, imgs, pts3d, masks, focals, poses,
                     as_pointcloud=True)
    gltf, bin_ = _parse_glb(path)
    edges0 = next(m for m in gltf["meshes"] if m["name"] == "cam_0_edges")
    acc = gltf["accessors"][edges0["primitives"][0]["attributes"]["POSITION"]]
    v = gltf["bufferViews"][acc["bufferView"]]
    pts = np.frombuffer(bin_[v["byteOffset"]:v["byteOffset"]
                             + v["byteLength"]], np.float32).reshape(-1, 3)
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-5)  # apex at origin
    # second camera's apex sits cam_0 -> cam_1 translation away (x shifted
    # by -1 after the diag(-1,-1,1) OpenGL flip)
    edges1 = next(m for m in gltf["meshes"] if m["name"] == "cam_1_edges")
    acc1 = gltf["accessors"][edges1["primitives"][0]["attributes"]["POSITION"]]
    v1 = gltf["bufferViews"][acc1["bufferView"]]
    pts1 = np.frombuffer(bin_[v1["byteOffset"]:v1["byteOffset"]
                              + v1["byteLength"]], np.float32).reshape(-1, 3)
    np.testing.assert_allclose(pts1[0], [-1.0, 0, 0], atol=1e-5)


def test_glb_transparent_cams_and_colors(tmp_path):
    imgs, pts3d, masks, focals, poses = _scene_arrays()
    path = str(tmp_path / "scene.glb")
    export_scene_glb(path, imgs, pts3d, masks, focals, poses,
                     as_pointcloud=True, transparent_cams=True,
                     cam_color=(1, 2, 3))
    gltf, _ = _parse_glb(path)
    assert "images" not in gltf          # no textured planes
    assert all(m["primitives"][0]["mode"] in (0, 1) for m in gltf["meshes"])


def test_export_scene_result_glb_duck(tmp_path):
    """The SceneResult wrapper needs only the getter quartet + imgs."""
    from align3r_tpu.eval.glb import export_scene_result_glb
    imgs, pts3d, masks, focals, poses = _scene_arrays()

    class Duck:
        def __init__(self):
            self.imgs = imgs * 2 - 1       # [-1, 1] like SceneResult
        get_pts3d = staticmethod(lambda: pts3d)
        get_masks = staticmethod(lambda: masks)
        get_focals = staticmethod(lambda: focals)
        get_im_poses = staticmethod(lambda: poses)

    path = export_scene_result_glb(Duck(), str(tmp_path / "s.glb"))
    gltf, bin_ = _parse_glb(path)
    _check_layout(gltf, bin_)
    assert gltf["meshes"][0]["name"] == "scene"


def test_glb_builder_rejects_empty():
    with pytest.raises(ValueError):
        GlbBuilder().add_points(np.zeros((0, 3)), np.zeros((0, 3)))
