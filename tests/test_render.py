"""Offline renderer tests (N6): npz trajectory -> mp4 with real scene geoms."""

import os

import numpy as np
import pytest

import isaacgym_tpu
from isaacgym_tpu.viewer.trajectory import record_env_rollout
from isaacgym_tpu.viewer.render import render_trajectory, scene_geom_table


@pytest.fixture(scope="module")
def traj_npz(tmp_path_factory):
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=4, episodeLength=40)
    p = str(tmp_path_factory.mktemp("traj") / "c7.npz")
    record_env_rollout(env, steps=25, envs=1, out_path=p)
    return p, env


def test_geom_table_covers_scene(traj_npz):
    p, env = traj_npz
    tab = scene_geom_table(env.scene)
    expected = (len(env.scene.static_geoms) + len(env.scene.art_geoms)
                + len(env.scene.free_bodies))
    assert tab.shape == (expected, 12)
    assert (tab[:, 0] >= 0).all() and (tab[:, 0] < env.scene.num_bodies).all()
    data = dict(np.load(p))
    assert "geoms" in data and data["geoms"].shape == tab.shape


def test_render_mp4(traj_npz, tmp_path):
    p, env = traj_npz
    out = str(tmp_path / "c7.mp4")
    render_trajectory(p, out, fps=30, size=(320, 180))
    assert os.path.getsize(out) > 2000
    # decode one frame back and check the scene actually drew something
    import cv2
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok
    assert frame.std() > 5.0  # not a blank canvas


def test_render_gif_fallback(traj_npz, tmp_path):
    p, env = traj_npz
    out = str(tmp_path / "c7.gif")
    render_trajectory(p, out, fps=30, size=(160, 90))
    assert os.path.getsize(out) > 1000


def test_render_cli(traj_npz, tmp_path, capsys):
    from isaacgym_tpu.viewer.render import main
    p, env = traj_npz
    out = str(tmp_path / "cli.mp4")
    main([p, out, "--fps", "30", "--width", "256", "--height", "144"])
    assert os.path.exists(out)


def test_live_viewer_endpoints(traj_npz):
    """Interactive viewer (N6): meta + on-demand frame rendering over HTTP,
    orbit-camera parameters honored."""
    import threading
    import urllib.request
    from isaacgym_tpu.viewer.live import serve

    npz, _ = traj_npz
    httpd = serve(str(npz), port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        meta = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/meta", timeout=10).read()
        assert b'"T"' in meta
        jpg1 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?t=1&az=-60&el=30&dist=3.5",
            timeout=30).read()
        jpg2 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?t=1&az=120&el=10&dist=6",
            timeout=30).read()
        assert jpg1[:2] == b"\xff\xd8" and jpg2[:2] == b"\xff\xd8"  # JPEG magic
        assert jpg1 != jpg2  # camera moved -> different image
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read()
        assert b"isaacgym_tpu viewer" in page
    finally:
        httpd.shutdown()


def test_debug_lines_roundtrip_and_render(traj_npz, tmp_path):
    """N6 add_lines/clear_lines parity (reference gym.add_lines at
    ...only_3_actor.py:661-668, clear_lines in the viewer loop): segments
    persist until cleared, survive the npz roundtrip NaN-padded, and the
    renderer draws them."""
    from isaacgym_tpu.viewer.trajectory import TrajectoryRecorder
    from isaacgym_tpu.viewer.render import render_frames

    _, env = traj_npz
    rec = TrajectoryRecorder(env.scene.body_names, max_envs=1, scene=env.scene)
    bs = np.zeros((1, env.scene.num_bodies, 13), np.float32)
    bs[..., 6] = 1.0  # identity quats
    rec.add_lines([[[0, 0, 1], [1, 0, 1]]], colors=[[0, 1, 0]])
    rec.record(bs)                       # frame 0: 1 segment
    rec.add_lines(np.asarray([[0, -1, 1, 0, 1, 1]]))  # flat (n,6) form
    rec.record(bs)                       # frame 1: 2 segments (persist)
    rec.clear_lines()
    rec.record(bs)                       # frame 2: none
    p = str(tmp_path / "lines.npz")
    rec.save(p)

    data = dict(np.load(p))
    assert data["lines"].shape == (3, 2, 2, 3)
    assert np.isfinite(data["lines"][0, 0]).all()
    assert np.isnan(data["lines"][0, 1]).all()      # frame-0 padding
    assert np.isfinite(data["lines"][1]).all()       # both live in frame 1
    assert np.isnan(data["lines"][2]).all()          # cleared
    np.testing.assert_allclose(data["line_colors"][0, 0], [0, 1, 0])

    frames = list(render_frames(data["body_states"][:, 0], data["geoms"],
                                size=(160, 90), lines=data["lines"],
                                line_colors=data["line_colors"]))
    # the green segment must have painted pixels frame 0 vs the cleared frame
    assert frames[0].shape == (90, 160, 3)
    assert (frames[0] != frames[2]).any()
