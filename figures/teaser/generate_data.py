"""Teaser experiment: one scene, four methods (reference
figures/teaser/generate_data.py:18-38 — nefertiti; ours 2170 steps,
ours+remesh 1320, laplacian-regularized 2500, naive 2420; equal-time
frozen step counts).

Hyperparameters mirror the reference exactly
(figures/teaser/generate_data.py:18-28): boost 3, α = 0.98, l1 loss;
AdamUniform lr 2e-3 for the smooth legs, Adam lr 1e-2 for reg (weight 16)
and naive; remesh at step 250 for the remesh leg.  ``cull_backfaces`` stays
OFF: it is image-exact on static closed meshes (tests/test_device_bins.py)
but a 100-step A/B at this config measured a 14% loss gap — triangles that
flip mid-optimization become visible backfaces and would be culled.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

SCENE = "nefertiti"
COMMON = {"boost": 3, "alpha": 0.98, "loss": "l1"}
METHODS = {
    "ours":        {**COMMON, "steps": 2170, "smooth": True,
                    "step_size": 2e-3, "optimizer": "AdamUniform"},
    "ours_remesh": {**COMMON, "steps": 1320, "smooth": True,
                    "step_size": 2e-3, "optimizer": "AdamUniform",
                    "remesh": 250},
    "reg":         {**COMMON, "steps": 2500, "smooth": False, "reg": 16.0,
                    "step_size": 1e-2, "optimizer": "Adam"},
    "naive":       {**COMMON, "steps": 2420, "smooth": False,
                    "step_size": 1e-2, "optimizer": "Adam"},
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
        # the remesh leg starts one subdivision coarser (see common.SCENES
        # "nefertiti_coarse") so its post-remesh epoch stays in HBM
        scene = "nefertiti_coarse" if name == "ours_remesh" else SCENE
        run(name, scene, params, "teaser")
