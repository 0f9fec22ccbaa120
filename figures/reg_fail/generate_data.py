"""Regularization-failure experiment (reference
figures/reg_fail/generate_data.py:19-38: silhouette-only loss, ours with
lambda=99 vs Adam+regularization at weights [1, 400, 10000], 25000 steps)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    steps = 25000 if not quick else 60
    run("ours", "suzanne",
        {"steps": steps, "smooth": True, "lambda": 99.0, "shading": False,
         "step_size": 0.05, "loss": "l1"}, "reg_fail")
    for w in ([1.0, 400.0, 10000.0] if not quick else [400.0]):
        run(f"reg_{w:g}", "suzanne",
            {"steps": steps, "smooth": False, "reg": w, "shading": False,
             "optimizer": "Adam", "step_size": 0.001, "loss": "l1",
             "bilaplacian": True}, "reg_fail")
