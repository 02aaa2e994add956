"""Mesh-render pipeline tests (host-side; matplotlib fallback backend)."""

import numpy as np
import pytest

from seeme_tpu.render.mesh import (
    get_frameidx,
    mesh_detect,
    prepare_mesh_frames,
    render_mesh,
    sequence_color,
)


def test_mesh_detect_heuristic():
    assert mesh_detect(np.zeros((4, 6890, 3)))
    assert not mesh_detect(np.zeros((4, 24, 3)))  # joints


def test_prepare_mesh_frames_axes_and_floor():
    rng = np.random.RandomState(0)
    data = rng.randn(5, 50, 3)
    out = prepare_mesh_frames(data)
    # gravity axis swap: y-up input becomes z-up ([2, 0, 1] reorder,
    # `blender/meshes.py:75-80`)
    np.testing.assert_allclose(out[..., 0], data[..., 2] )
    np.testing.assert_allclose(out[..., 1], data[..., 0])
    # floor removed: global min of the up axis is exactly 0
    assert abs(out[..., 2].min()) < 1e-12

    on_floor = prepare_mesh_frames(data, always_on_floor=True)
    per_frame_min = on_floor[..., 2].min(axis=1)
    np.testing.assert_allclose(per_frame_min, 0.0, atol=1e-12)


def test_get_frameidx_modes():
    assert get_frameidx("video", 7, None, 99) == list(range(7))
    seq = get_frameidx("sequence", 10, None, 4)
    assert len(seq) == 4 and seq[0] == 0 and seq[-1] == 9
    assert get_frameidx("frame", 10, 0.5, 0) == [5]
    with pytest.raises(ValueError):
        get_frameidx("nope", 1, None, 1)


def test_sequence_color_ramp():
    c0, c1 = sequence_color(0.0), sequence_color(1.0)
    assert len(c0) == 3 and c0 != c1


@pytest.mark.parametrize("mode,suffix", [("video", ".gif"), ("sequence", ".png")])
def test_render_mesh_fallback_writes_file(tmp_path, mode, suffix):
    rng = np.random.RandomState(1)
    T, V = 3, 30
    verts = rng.randn(T, V, 3) * 0.2
    faces = np.stack([np.arange(V - 2), np.arange(1, V - 1), np.arange(2, V)], 1)
    out = render_mesh(verts, faces, str(tmp_path / f"m{suffix}"),
                      mode=mode, num=2, fps=5)
    assert out.endswith(suffix)
    import os
    assert os.path.getsize(out) > 0


class TestPyrenderBackend:
    """Mid-tier offscreen renderer (`mld/render/renderer.py` port). The GL
    path needs pyrender installed; the math is tested unconditionally."""

    def test_weak_perspective_matrix(self):
        from seeme_tpu.render.pyrender_backend import weak_perspective_matrix

        P = weak_perspective_matrix((0.75, 0.5), (0.2, 0.1))
        # `renderer.py:40-48`: diag scales, translation premultiplied by
        # scale with y negated, z flipped
        assert P[0, 0] == 0.75 and P[1, 1] == 0.5
        np.testing.assert_allclose(P[0, 3], 0.2 * 0.75)
        np.testing.assert_allclose(P[1, 3], -0.1 * 0.5)
        assert P[2, 2] == -1 and P[3, 3] == 1

    def test_rotation_x_flip(self):
        from seeme_tpu.render.pyrender_backend import rotation_x

        R = rotation_x(180.0)
        v = np.array([0.1, 0.2, 0.3, 1.0])
        out = R @ v
        np.testing.assert_allclose(out[:3], [0.1, -0.2, -0.3], atol=1e-12)

    def test_video_render_when_available(self, tmp_path):
        pytest.importorskip("pyrender")
        from seeme_tpu.render.pyrender_backend import (
            render_mesh_video_pyrender,
        )

        rng = np.random.RandomState(0)
        verts = rng.randn(3, 32, 3) * 0.1
        faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
        out = render_mesh_video_pyrender(
            verts, faces, str(tmp_path / "m.gif"), resolution=(64, 64))
        assert out.endswith(".gif") and (tmp_path / "m.gif").exists()

    def test_render_mesh_backend_selection(self, tmp_path, monkeypatch):
        """Without bpy/pyrender, render_mesh falls through to matplotlib."""
        from seeme_tpu.render import mesh as mesh_mod

        monkeypatch.setattr(
            "seeme_tpu.render.joints.blender_available", lambda: False)
        rng = np.random.RandomState(0)
        verts = rng.randn(2, 1500, 3) * 0.1 + np.array([0, 1, 0])
        faces = np.stack([np.arange(0, 30), np.arange(1, 31),
                          np.arange(2, 32)], axis=1)
        out = mesh_mod.render_mesh(
            verts, faces, str(tmp_path / "v.gif"), mode="video", fps=4)
        assert (tmp_path / "v.gif").exists() or out.endswith(".gif")
