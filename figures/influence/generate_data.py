"""Alpha-influence sweep (reference figures/influence/generate_data.py:28-34:
alpha from 0 to 0.999, fixed step count; halved symmetric Hausdorff
recorded per alpha)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

ALPHAS = [0.0, 0.5, 0.9, 0.95, 0.99, 0.999]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    for a in (ALPHAS if not quick else [0.95]):
        run(f"alpha_{a:g}", "suzanne",
            {"steps": 1080 if not quick else 50, "smooth": True, "alpha": a,
             "lambda": None, "step_size": 0.05, "boost": 3}, "influence")
