"""Multiscale experiment (reference figures/multiscale/generate_data.py:17-26:
dragon, 16000 steps, remesh at [500,1500,3000,4500,7000,10000,12000,14000],
lambda=19)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    # reference multiscale/generate_data.py:19-26: lr 1e-1, l1, λ=19, boost 3
    params = {
        "steps": 16000, "smooth": True, "lambda": 19.0, "step_size": 1e-1,
        "loss": "l1", "boost": 3,
        "remesh": [500, 1500, 3000, 4500, 7000, 10000, 12000, 14000],
    }
    if quick:
        params.update(steps=120, remesh=[40, 80])
    run("multiscale", "dragon", params, "multiscale")
