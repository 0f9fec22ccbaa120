"""Remeshing-timing experiment (reference figures/remeshing/generate_data.py:
19-45: cranium; reg baseline (Adam, reg 0.16), ours without remeshing, ours
with a remesh at step 750, ours remeshing at step 0 — equal-time frozen
steps [1890, 1800, 1630, 1500]; lr 1e-2, l1, alpha 0.95)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

COMMON = {"boost": 3, "step_size": 1e-2, "loss": "l1", "alpha": 0.95}
METHODS = [
    ("reg", {"smooth": False, "optimizer": "Adam", "reg": 0.16,
             "steps": 1890, "remesh": -1}),
    ("base", {"smooth": True, "optimizer": "AdamUniform",
              "steps": 1800, "remesh": -1}),
    ("remesh_middle", {"smooth": True, "optimizer": "AdamUniform",
                       "steps": 1630, "remesh": 750}),
    ("remesh_start", {"smooth": True, "optimizer": "AdamUniform",
                      "steps": 1500, "remesh": 0}),
]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    for name, m in METHODS:
        if only and name != only:
            continue
        params = {**COMMON, **m}
        if quick:
            params["steps"] = 60
            if params["remesh"] == 750:
                params["remesh"] = 20
        run(name, "cranium", params, "remeshing")
