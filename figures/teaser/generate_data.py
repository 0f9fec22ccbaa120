"""Teaser experiment: one scene, four methods (reference
figures/teaser/generate_data.py:18-38 — nefertiti; ours 2170 steps,
ours+remesh 1320, laplacian-regularized 2500, naive 2420; equal-time
frozen step counts)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

SCENE = "nefertiti"
METHODS = {
    "ours":        {"steps": 2170, "smooth": True,  "lambda": 19.0, "step_size": 0.05, "boost": 3},
    "ours_remesh": {"steps": 1320, "smooth": True,  "lambda": 19.0, "step_size": 0.05, "boost": 3,
                    "remesh": [300]},
    "reg":         {"steps": 2500, "smooth": False, "reg": 6.0, "optimizer": "Adam",
                    "step_size": 0.001, "boost": 3},
    "naive":       {"steps": 2420, "smooth": False, "optimizer": "Adam",
                    "step_size": 0.001, "boost": 3},
}

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    for name, params in METHODS.items():
        if only and name != only:
            continue
        if quick:
            params = dict(params, steps=min(params["steps"], 50))
        run(name, SCENE, params, "teaser")
