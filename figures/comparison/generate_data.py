"""Comparison experiment (reference figures/comparison/generate_data.py:
21-58: six scenes x {ours, laplacian-reg, bilaplacian-reg} at frozen
equal-time step counts; symmetric Hausdorff recorded)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

# frozen equal-time step counts (reference comparison/generate_data.py:25-26)
OURS_STEPS = {"suzanne": 1080, "cranium": 1820, "bob": 930, "bunny": 1380,
              "tshirt": 370, "planck": 915}
BASE_STEPS = {"suzanne": 1130, "cranium": 1910, "bob": 940, "bunny": 1450,
              "tshirt": 390, "planck": 960}

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    scenes = list(OURS_STEPS) if not quick else ["suzanne"]
    for scene in scenes:
        s_ours = OURS_STEPS[scene] if not quick else 50
        s_base = BASE_STEPS[scene] if not quick else 50
        run(f"{scene}_ours", scene,
            {"steps": s_ours, "smooth": True, "lambda": 19.0,
             "step_size": 0.05, "boost": 3}, "comparison")
        run(f"{scene}_lapreg", scene,
            {"steps": s_base, "smooth": False, "reg": 2.0, "bilaplacian": False,
             "optimizer": "Adam", "step_size": 0.001, "boost": 3}, "comparison")
        run(f"{scene}_bilapreg", scene,
            {"steps": s_base, "smooth": False, "reg": 6.0, "bilaplacian": True,
             "optimizer": "Adam", "step_size": 0.001, "boost": 3}, "comparison")
