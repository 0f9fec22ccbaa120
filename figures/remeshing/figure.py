"""Remeshing-timing figure (reference figures/remeshing/figure.ipynb):
loss curves for the four methods (reg baseline, ours, remesh at 750,
remesh at 0), plus the final Hausdorff per method."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

METHODS = ["reg", "base", "remesh_middle", "remesh_start"]

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "remeshing")
    names = [m for m in METHODS
             if os.path.isfile(os.path.join(d, f"{m}_loss.csv"))]
    if not names:
        pl.require([os.path.join(d, "base_loss.csv")],
                   "figures/remeshing/generate_data.py")
    runs, dists = [], []
    for m in names:
        its, im, _ = pl.read_loss_csv(os.path.join(d, f"{m}_loss.csv"))
        runs.append((m, its, im))
        dists.append(pl.read_metrics_csv(
            os.path.join(d, f"{m}_metrics.csv"))["hausdorff"])

    fig, (ax0, ax1) = pl.plt.subplots(1, 2, figsize=(9.2, 3.6))
    pl.loss_axes(ax0, runs)
    pl.bar_axes(ax1, names, dists, "sym. Hausdorff")
    pl.save(fig, os.path.join(d, "figure.png"))
