"""Viewpoint-count sweep (reference figures/viewpoints/generate_data.py:
17-40: bunny at 1..49 cameras, equal-time frozen steps
[5240, 4470, 3350, 2030, 1370, 930, 510])."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run, SCENES
from largesteps_tpu.io.synth import make_scene

CAMS =  [1, 2, 4, 9, 16, 25, 49]
STEPS = [5240, 4470, 3350, 2030, 1370, 930, 510]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    pairs = list(zip(CAMS, STEPS)) if not quick else [(4, 60)]
    for n_cams, steps in pairs:
        SCENES[f"bunny_{n_cams}"] = dict(SCENES["bunny"], n_views=n_cams)
        run(f"views_{n_cams}", f"bunny_{n_cams}",
            {"steps": steps, "smooth": True, "lambda": 19.0,
             "step_size": 0.05, "boost": 3}, "viewpoints")
