"""Viewpoint-count sweep (reference figures/viewpoints/generate_data.py:
15-45: bunny at [1, 2, 4, 9, 16, 25, 49] cameras; ours (AdamUniform) vs
Adam+bilap reg 2.1 at equal-time frozen steps; lr 1e-2, l1, alpha 0.95)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run, SCENES

CAMS = [1, 2, 4, 9, 16, 25, 49]
STEPS_OURS = [5240, 4470, 3350, 2030, 1370, 930, 510]
STEPS_REG = [6620, 5580, 3900, 2220, 1440, 960, 510]
COMMON = {"boost": 3, "step_size": 1e-2, "loss": "l1", "alpha": 0.95}

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    idxs = range(len(CAMS)) if not quick else [2]
    for i in idxs:
        n_cams = CAMS[i]
        SCENES[f"bunny_{n_cams}"] = dict(SCENES["bunny"], n_views=n_cams)
        run(f"views_{n_cams}_ours", f"bunny_{n_cams}",
            {**COMMON, "steps": STEPS_OURS[i] if not quick else 60,
             "smooth": True, "optimizer": "AdamUniform"}, "viewpoints")
        run(f"views_{n_cams}_reg", f"bunny_{n_cams}",
            {**COMMON, "steps": STEPS_REG[i] if not quick else 60,
             "smooth": False, "reg": 2.1, "bilaplacian": True,
             "optimizer": "Adam"}, "viewpoints")
