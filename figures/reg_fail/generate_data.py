"""Regularization-failure experiment (reference
figures/reg_fail/generate_data.py:19-38: silhouette-only loss, ours with
lambda=99 vs Adam+bilaplacian regularization at weights [1, 400, 10000],
25001 steps; lr 5e-3, l2 loss, no translation channel)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run

COMMON = {"shading": False, "boost": 3, "loss": "l2", "use_tr": False}

if __name__ == "__main__":
    quick = "--quick" in sys.argv
    steps = 25001 if not quick else 60
    run("ours", "suzanne",
        {**COMMON, "steps": steps, "smooth": True, "lambda": 99.0,
         "step_size": 5e-3, "optimizer": "AdamUniform"}, "reg_fail")
    for w in ([1.0, 400.0, 10000.0] if not quick else [400.0]):
        run(f"reg_{w:g}", "suzanne",
            {**COMMON, "steps": steps, "smooth": False, "reg": w,
             "optimizer": "Adam", "step_size": 5e-3,
             "bilaplacian": True}, "reg_fail")
