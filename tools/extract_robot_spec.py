"""Extract standalone JSON robot specs from URDF/SRDF asset trees.

Run once (with the reference assets or any Unitree description package
available) to produce tpu_locoman/robots/specs/*.json — the framework's
shippable numeric robot descriptions.

Usage: python tools/extract_robot_spec.py [asset_root]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_locoman.model import (  # noqa: E402
    parse_urdf,
    load_srdf_reference_configurations,
    build_reduced_model,
    model_to_dict,
)

SPECS = {
    "go2": ("go2_description/urdf/go2.urdf", "go2_description/srdf/go2.srdf", None),
    "b2": ("b2_description/urdf/b2.urdf", "b2_description/srdf/b2.srdf", None),
    "b2g": ("b2g_description/urdf/b2g.urdf", "b2g_description/srdf/b2g.srdf", [20]),
    "b2g_arm_locked": (
        "b2g_description/urdf/b2g.urdf",
        "b2g_description/srdf/b2g.srdf",
        list(range(14, 21)),
    ),
}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/robots"
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "tpu_locoman", "robots", "specs"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, (urdf, srdf, lock) in SPECS.items():
        model = parse_urdf(os.path.join(root, urdf))
        if lock:
            q_neutral = np.zeros(model.nq)
            q_neutral[6] = 1.0
            model = build_reduced_model(model, lock, q_neutral)
        load_srdf_reference_configurations(model, os.path.join(root, srdf))
        out = os.path.join(out_dir, name + ".json")
        with open(out, "w") as f:
            json.dump(model_to_dict(model), f)
        print(
            f"{name}: nq={model.nq} nv={model.nv} mass={model.total_mass:.3f} "
            f"joints={len(model.joint_names)} frames={len(model.frames)} -> {out}"
        )


if __name__ == "__main__":
    main()
