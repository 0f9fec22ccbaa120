"""Attribute the sustained-vs-steady it/s gap at nefertiti scale.

Round-4 verdict: the bench's steady 6 it/s at 163,842 verts was measured
with rebinning off, while the delivered teaser run sustained 0.65 it/s.
This probe runs short driver slices (teaser `ours` config, reference
figures/teaser/generate_data.py:18-28) under different rebin policies and
prints one JSON line per leg with the driver's own prof counters, so the
gap decomposes into: device step time, rebin count x rebin cost, and
dispatch-queue stalls.

Usage:  python benchmarks/probe_sustained.py [steps]
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from largesteps_tpu.io.synth import make_scene
from largesteps_tpu.driver import optimize_shape

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 80

BASE = {
    "boost": 3, "alpha": 0.98, "loss": "l1", "smooth": True,
    "step_size": 2e-3, "optimizer": "AdamUniform", "steps": STEPS,
}

LEGS = {
    # driver default policy — the number the teaser run actually pays
    "default": {},
    # max-interval only (no displacement trigger): isolates trigger cadence
    "no_auto": {"rebin_auto": False},
    # no mid-run rebins at all: the round-4 "steady" measurement condition
    "no_rebin": {"rebin_auto": False, "rebin_every": 0},
    # wider stale-margin window: fewer rebins, fatter bins
    "margin8": {"rebin_margin": 8.0},
}


def main():
    scene = make_scene(source=("icosphere", 7), target=("gourd", 7),
                       n_views=13, res=256)
    for name, over in LEGS.items():
        params = dict(BASE, **over)
        t0 = time.perf_counter()
        r = optimize_shape(scene, params)
        wall = r["wall_time"]
        prof = r.get("prof", {})
        post = wall - prof.get("first_step_s", 0.0)
        line = {
            "leg": name,
            "iters": r["iters"],
            "wall_s": round(wall, 2),
            "total_s": round(time.perf_counter() - t0, 2),
            "sustained_it_s": round((r["iters"] - 1) / max(post, 1e-9), 3),
            "setup_s": round(prof.get("setup_s", 0.0), 2),
            "first_step_s": round(prof.get("first_step_s", 0.0), 2),
            "rebin_n": prof.get("rebin_n", 0),
            "rebin_s": round(prof.get("rebin_s", 0.0), 2),
            "max_window_disp_px": round(prof.get("max_window_disp_px", 0.0), 2),
            "loss_final": float(r["losses"][-1][0]) if len(r["losses"]) else None,
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
