"""Debug-draw + profiling utility tests."""

import numpy as np

from headtrackr_tpu.utils import draw_box, draw_rotated_box, render_debug_frame, StageTimer


def test_draw_box_strokes_edges():
    f = np.zeros((40, 60, 3), np.uint8)
    draw_box(f, 10, 5, 20, 15, color=(0, 0, 204))
    assert tuple(f[5, 20]) == (0, 0, 204)     # top edge
    assert tuple(f[20, 10]) == (0, 0, 204)    # left edge
    assert tuple(f[12, 15]) == (0, 0, 0)      # interior untouched


def test_draw_rotated_box_in_bounds():
    f = np.zeros((40, 60, 3), np.uint8)
    draw_rotated_box(f, 30, 20, 16, 10, np.pi / 3)
    assert (f == (0, 204, 0)).all(axis=-1).sum() > 20


def test_render_debug_frame_cs():
    class Out:
        detection = np.int32(2)
        face_x, face_y = np.float32(30), np.float32(20)
        face_w, face_h = np.float32(16), np.float32(12)
        face_angle = np.float32(np.pi / 2)
        face_conf = np.float32(1.0)

    f = np.zeros((40, 60, 3), np.uint8)
    bp = np.random.default_rng(0).random((40, 60))
    img = render_debug_frame(f, Out(), backprojection=bp)
    assert img.shape == (40, 120, 3)
    assert (img[:, :60] == (0, 204, 0)).all(axis=-1).any()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2 and "a" in t.report()
