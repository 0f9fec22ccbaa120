"""Viewpoints figure (reference figures/viewpoints/figure.ipynb):
final symmetric Hausdorff distance as a function of camera count."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "viewpoints")
    cams, dists = [], []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.startswith("views_") and f.endswith("_metrics.csv"):
                cams.append(int(f.split("_")[1]))
                dists.append(pl.read_metrics_csv(os.path.join(d, f))["hausdorff"])
    if not cams:
        pl.require([os.path.join(d, "views_1_metrics.csv")],
                   "figures/viewpoints/generate_data.py")
    order = pl.np.argsort(cams)
    cams = pl.np.asarray(cams)[order]
    dists = pl.np.asarray(dists)[order]

    fig, ax = pl.plt.subplots(figsize=(4.6, 3.4))
    ax.plot(cams, dists, color=pl.SERIES[0], marker="o", markersize=5)
    ax.set_xlabel("viewpoints")
    ax.set_ylabel("sym. Hausdorff")
    ax.set_xscale("log")
    ax.set_xticks(list(cams), [str(c) for c in cams])
    pl.save(fig, os.path.join(d, "figure.png"))
