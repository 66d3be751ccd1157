"""Host-side visualization and trajectory dumping.

The reference uses a MeshCat websocket viewer plus matplotlib q/v/tau plots
(run_mpc.py:163-165,243-267). TPU-side we keep visualization strictly
host-side (SURVEY.md §2.2): trajectory dumps (JSON) for any external viewer
plus the same matplotlib joint plots, import-gated.
"""

import json

import numpy as np


def dump_trajectory(path, q_traj, dt, v_traj=None, tau_traj=None):
    """Write an executed trajectory for offline replay (the MeshCat-replay
    analog, run_mpc.py:270-273)."""
    out = {"dt": float(dt), "q": np.asarray(q_traj).tolist()}
    if v_traj is not None:
        out["v"] = np.asarray(v_traj).tolist()
    if tau_traj is not None:
        out["tau"] = np.asarray(tau_traj).tolist()
    with open(path, "w") as f:
        json.dump(out, f)
    return path


def plot_joint_trajectories(q_traj, v_traj, tau_traj, nj=12, path=None,
                            labels=None):
    """The reference's q/v/tau joint plots (run_mpc.py:243-267)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if labels is None:
        labels = [
            f"{leg} {part}"
            for leg in ["FL", "FR", "RL", "RR"]
            for part in ["hip", "thigh", "calf"]
        ]
    q_traj = np.asarray(q_traj)
    v_traj = np.asarray(v_traj)
    tau_traj = np.asarray(tau_traj)

    fig, axs = plt.subplots(3, 1, figsize=(10, 15))
    axs[0].set_title("Joint positions (q)")
    for j in range(nj):
        axs[0].plot(q_traj[:, 7 + j], label=labels[j % len(labels)])
    axs[1].set_title("Joint velocities (v)")
    for j in range(nj):
        axs[1].plot(v_traj[:, 6 + j], label=labels[j % len(labels)])
    axs[2].set_title("Joint torques (tau)")
    for j in range(nj):
        axs[2].plot(tau_traj[:, j], label=labels[j % len(labels)])
    for ax in axs:
        ax.legend(fontsize=6, ncol=4)
    plt.tight_layout()
    if path:
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path
    return fig
