"""Remeshing-timing ablation (reference figures/remeshing/generate_data.py:
27-43: cranium, single remesh event at varying iterations)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

TIMINGS = [100, 250, 500, 1000]

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    for t in (TIMINGS if not quick else [20]):
        params = {"steps": 1820 if not quick else 60, "smooth": True,
                  "lambda": 19.0, "step_size": 0.05, "boost": 3, "remesh": [t]}
        run(f"remesh_at_{t}", "cranium", params, "remeshing")
