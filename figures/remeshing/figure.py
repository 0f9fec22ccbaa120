"""Remeshing-timing figure (reference figures/remeshing/figure.ipynb):
loss curves for a single remesh event at varying iterations, plus the
final Hausdorff per timing."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "remeshing")
    timings, runs, dists = [], [], []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.startswith("remesh_at_") and f.endswith("_loss.csv"):
                t = int(f[len("remesh_at_"):-len("_loss.csv")])
                timings.append(t)
    timings.sort()
    if not timings:
        pl.require([os.path.join(d, "remesh_at_100_loss.csv")],
                   "figures/remeshing/generate_data.py")
    for t in timings:
        its, im, _ = pl.read_loss_csv(os.path.join(d, f"remesh_at_{t}_loss.csv"))
        runs.append((f"remesh @ {t}", its, im))
        mc = os.path.join(d, f"remesh_at_{t}_metrics.csv")
        dists.append(pl.read_metrics_csv(mc)["hausdorff"])

    fig, (ax0, ax1) = pl.plt.subplots(1, 2, figsize=(9.2, 3.6))
    pl.loss_axes(ax0, runs)
    pl.bar_axes(ax1, [str(t) for t in timings], dists, "sym. Hausdorff")
    ax1.set_xlabel("remesh iteration")
    pl.save(fig, os.path.join(d, "figure.png"))
