"""Live streaming viewer: serve, push, poll — all on localhost.

The reference displays live MPC state through a MeshCat websocket viewer
(run_mpc.py:163-165); LiveViewer is the zero-dependency analog. This test
exercises the full client protocol headlessly via urllib.
"""

import json
import urllib.request

import numpy as np

from tpu_locoman import Go2


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read().decode()


def test_live_viewer_roundtrip():
    from tpu_locoman.viz import LiveViewer

    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    model = robot.model
    viewer = LiveViewer(model, frame_names=tuple(robot.foot_frames),
                        dt=0.02, port=0)
    try:
        # player page in live mode
        status, html = _get(viewer.url)
        assert status == 200
        assert "const LIVE = true;" in html
        assert "liveTick" in html

        # scene metadata
        status, body = _get(viewer.url + "scene")
        scene = json.loads(body)
        n_pts = model.n_links + 4
        assert np.asarray(scene["points"]).shape == (1, n_pts, 3)
        assert len(scene["markers"]) == 4

        # no frame pushed yet at seq 0 -> 204 when caller is up to date
        status, body = _get(viewer.url + "frame?since=0")
        assert status == 204

        # push the standing configuration and poll it back
        q = np.asarray(robot.q0)
        seq = viewer.push(q)
        assert seq == 1
        status, body = _get(viewer.url + "frame?since=0")
        assert status == 200
        frame = json.loads(body)
        assert frame["seq"] == 1
        pts = np.asarray(frame["points"])
        assert pts.shape == (n_pts, 3)
        # feet markers near the ground in the nominal pose
        feet_z = pts[scene["markers"], 2]
        assert np.all(np.abs(feet_z) < 0.12), feet_z

        # stale poll returns 204, fresh push bumps seq
        status, _ = _get(viewer.url + "frame?since=1")
        assert status == 204
        assert viewer.push(q) == 2
        status, body = _get(viewer.url + "frame?since=1")
        assert status == 200 and json.loads(body)["seq"] == 2
    finally:
        viewer.close()
