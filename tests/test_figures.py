"""Smoke tests for the figure layer (C20): every figures/*/figure.py must
consume its experiment's CSV/PLY artifacts and write figure.png.

Experiment outputs are fabricated tiny (the real generate_data runs take
minutes-hours); the figure scripts run as subprocesses with LS_OUTPUT_DIR
pointing at the fabricated tree, exactly as a user would run them."""
import csv
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_loss(path, n=80):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["iteration", "im_loss", "reg_loss"])
        for i in range(n):
            w.writerow([i, 1.0 / (i + 1), 0.01 / (i + 1)])


def _write_metrics(path, h=0.05):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["hausdorff", "iters", "wall_time_s", "iters_per_s"])
        w.writerow([h, 80, 10.0, 8.0])


def _write_mesh(path):
    from largesteps_tpu.io.ply import write_ply
    from largesteps_tpu.ops.shapes import icosphere

    v, f = icosphere(1)
    write_ply(path, v, f)


def _fabricate(out, exp, names, with_mesh=False):
    d = os.path.join(out, exp)
    os.makedirs(d, exist_ok=True)
    for i, name in enumerate(names):
        _write_loss(os.path.join(d, f"{name}_loss.csv"))
        _write_metrics(os.path.join(d, f"{name}_metrics.csv"), 0.05 + 0.01 * i)
        if with_mesh:
            _write_mesh(os.path.join(d, f"{name}_final.ply"))
    return d


CASES = {
    "comparison": (["suzanne_ours", "suzanne_lapreg", "suzanne_bilapreg"], True),
    "viewpoints": (["views_1_ours", "views_4_ours", "views_4_reg"], False),
    "influence": (["alpha_0", "alpha_0.5", "alpha_0.99"], False),
    "reg_fail": (["ours", "reg_1", "reg_400"], False),
    "multiscale": (["multiscale"], False),
    "remeshing": (["reg", "base", "remesh_middle"], False),
    "teaser": (["ours", "ours_remesh", "reg", "naive"], False),
}


@pytest.mark.parametrize("exp", sorted(CASES))
def test_figure_script(exp, tmp_path):
    names, with_mesh = CASES[exp]
    out = str(tmp_path)
    d = _fabricate(out, exp, names, with_mesh=with_mesh)
    env = dict(os.environ, LS_OUTPUT_DIR=out, LS_FORCE_CPU="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "figures", exp, "figure.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    png = os.path.join(d, "figure.png")
    assert os.path.exists(png) and os.path.getsize(png) > 1000
