"""Influence figure (reference figures/influence/figure.ipynb): halved
symmetric Hausdorff distance as a function of the alpha parameter."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "influence")
    alphas, dists = [], []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.startswith("alpha_") and f.endswith("_metrics.csv"):
                alphas.append(float(f[len("alpha_"):-len("_metrics.csv")]))
                # the reference halves the symmetric distance here
                # (figures/influence/figure.ipynb cell 4)
                dists.append(
                    pl.read_metrics_csv(os.path.join(d, f))["hausdorff"] / 2)
    if not alphas:
        pl.require([os.path.join(d, "alpha_0_metrics.csv")],
                   "figures/influence/generate_data.py")
    order = pl.np.argsort(alphas)
    alphas = pl.np.asarray(alphas)[order]
    dists = pl.np.asarray(dists)[order]

    fig, ax = pl.plt.subplots(figsize=(4.6, 3.4))
    ax.plot(pl.np.arange(len(alphas)), dists, color=pl.SERIES[0],
            marker="o", markersize=5)
    ax.set_xticks(pl.np.arange(len(alphas)), [f"{a:g}" for a in alphas])
    ax.set_xlabel(r"$\alpha$")
    ax.set_ylabel("Hausdorff / 2")
    pl.save(fig, os.path.join(d, "figure.png"))
