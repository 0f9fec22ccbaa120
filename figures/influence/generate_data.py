"""Alpha-influence sweep (reference figures/influence/generate_data.py:
19-34: suzanne, alpha in [0, 0.25, 0.5, 0.75, 0.95, 0.98, 0.99, 0.999],
4300 steps, AdamUniform lr 1e-3, l1 loss; halved symmetric Hausdorff
recorded per alpha)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

ALPHAS = [0.0, 0.25, 0.5, 0.75, 0.95, 0.98, 0.99, 0.999]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    for a in (ALPHAS if not quick else [0.95]):
        run(f"alpha_{a:g}", "suzanne",
            {"steps": 4300 if not quick else 50, "smooth": True, "alpha": a,
             "lambda": None, "step_size": 1e-3, "loss": "l1", "boost": 3,
             "optimizer": "AdamUniform"}, "influence")
