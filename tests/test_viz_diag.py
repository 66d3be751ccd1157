"""Visualization and diagnostics surface tests."""

import os

import numpy as np
import jax.numpy as jnp

from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig
from tpu_locoman.viz import dump_trajectory, plot_joint_trajectories
from tpu_locoman.diagnostics import (
    structure_check, solve_report, row_group_layout,
)


def _mpc():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    return MPC(robot, dynamics="centroidal_acc", nodes=3,
               config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10)))


def test_dump_and_plot(tmp_path):
    q = np.tile(np.concatenate([[0, 0, 0.35, 0, 0, 0, 1], np.zeros(12)]),
                (5, 1))
    v = np.zeros((5, 18))
    tau = np.zeros((5, 12))
    p = dump_trajectory(str(tmp_path / "t.json"), q, 0.01, v, tau)
    assert os.path.getsize(p) > 100
    png = plot_joint_trajectories(q, v, tau, nj=12,
                                  path=str(tmp_path / "p.png"))
    assert os.path.getsize(png) > 1000


def test_structure_check_and_report():
    mpc = _mpc()
    rep = structure_check(mpc)
    assert rep["finite"]
    assert rep["rows_per_node"] == mpc.trans.m
    # the C block only touches propagation rows -> sparse
    assert rep["C_nonzero_frac"] < 0.3

    groups = row_group_layout(mpc.trans)
    assert groups[-1][2] == mpc.trans.m

    carry = mpc.init_carry()
    import jax
    carry, _ = jax.jit(lambda c: mpc.step(
        c, jnp.float32(0.0), jnp.array([0.1, 0, 0, 0, 0, 0])))(carry)
    rep2 = solve_report(mpc, carry, jnp.float32(0.01),
                        jnp.array([0.1, 0, 0, 0, 0, 0]), solve=True)
    assert np.isfinite(rep2.max_violation)
    assert "dyn:q_prop" in rep2.violation_by_group
    assert isinstance(rep2.pretty(), str)


def test_scene_dump_and_player(tmp_path):
    from tpu_locoman.viz import dump_scene, write_player_html

    mpc = _mpc()
    q0 = np.asarray(mpc.form.x_nom()[: mpc.form.nq])
    q_traj = np.tile(q0, (4, 1))
    scene = dump_scene(
        str(tmp_path / "scene.json"), mpc.form.model, q_traj, 0.01,
        frame_names=tuple(mpc.form.foot_frames),
    )
    import json

    with open(scene) as f:
        s = json.load(f)
    n_pts = mpc.form.model.n_links + 4
    assert np.asarray(s["points"]).shape == (4, n_pts, 3)
    assert len(s["markers"]) == 4
    # feet sit near the ground in the nominal pose
    feet_z = np.asarray(s["points"])[0, s["markers"], 2]
    assert np.all(np.abs(feet_z) < 0.1), feet_z

    html = write_player_html(str(tmp_path / "replay.html"), scene)
    text = open(html).read()
    assert "SCENE" in text and '"points"' in text
    assert os.path.getsize(html) > 3000


def test_spy_plot(tmp_path):
    from tpu_locoman.diagnostics import spy_plot

    mpc = _mpc()
    rep = spy_plot(mpc, str(tmp_path / "spy.png"))
    assert os.path.getsize(rep["path"]) > 5000
    # the default formulations respect the expected stage structure
    assert rep["offending_entries"] == 0
