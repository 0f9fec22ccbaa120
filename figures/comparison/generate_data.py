"""Comparison experiment (reference figures/comparison/generate_data.py:
21-58: six scenes x {ours, laplacian-reg, bilaplacian-reg} at frozen
equal-time step counts; symmetric Hausdorff recorded).

Hyperparameters mirror the reference exactly (generate_data.py:21-28):
boost 3, l1 loss, α = 0.95; ours = AdamUniform at per-scene step sizes,
baselines = Adam lr 1e-2 with per-scene laplacian/bilaplacian reg weights.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

# frozen equal-time step counts (reference comparison/generate_data.py:25-26)
SCENES = ["suzanne", "cranium", "bob", "bunny", "tshirt", "planck"]
STEP_SIZES = {"suzanne": 2e-3, "cranium": 5e-3, "bob": 3e-3, "bunny": 1e-2,
              "tshirt": 3e-3, "planck": 3e-3}
OURS_STEPS = {"suzanne": 1080, "cranium": 1820, "bob": 930, "bunny": 1380,
              "tshirt": 370, "planck": 915}
BASE_STEPS = {"suzanne": 1130, "cranium": 1910, "bob": 940, "bunny": 1450,
              "tshirt": 390, "planck": 960}
REGS_LAP = {"suzanne": 2.8, "cranium": 0.21, "bob": 0.67, "bunny": 3.8,
            "tshirt": 12.0, "planck": 3.8}
REGS_BILAP = {"suzanne": 3.8, "cranium": 0.16, "bob": 0.37, "bunny": 2.1,
              "tshirt": 12.0, "planck": 5.0}
COMMON = {"boost": 3, "loss": "l1", "alpha": 0.95}

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    scenes = [only] if only else (SCENES if not quick else ["suzanne"])
    for scene in scenes:
        s_ours = OURS_STEPS[scene] if not quick else 50
        s_base = BASE_STEPS[scene] if not quick else 50
        run(f"{scene}_ours", scene,
            {**COMMON, "steps": s_ours, "smooth": True,
             "step_size": STEP_SIZES[scene], "optimizer": "AdamUniform"},
            "comparison")
        run(f"{scene}_lapreg", scene,
            {**COMMON, "steps": s_base, "smooth": False,
             "reg": REGS_LAP[scene], "bilaplacian": False,
             "optimizer": "Adam", "step_size": 1e-2}, "comparison")
        run(f"{scene}_bilapreg", scene,
            {**COMMON, "steps": s_base, "smooth": False,
             "reg": REGS_BILAP[scene], "bilaplacian": True,
             "optimizer": "Adam", "step_size": 1e-2}, "comparison")
