"""Viewpoints figure (reference figures/viewpoints/figure.ipynb):
final symmetric Hausdorff distance as a function of camera count."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "viewpoints")
    series = {"ours": {}, "reg": {}}
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.startswith("views_") and f.endswith("_metrics.csv"):
                parts = f[:-len("_metrics.csv")].split("_")
                n = int(parts[1])
                method = parts[2] if len(parts) > 2 else "ours"
                series.setdefault(method, {})[n] = pl.read_metrics_csv(
                    os.path.join(d, f))["hausdorff"]
    if not series["ours"]:
        pl.require([os.path.join(d, "views_1_ours_metrics.csv")],
                   "figures/viewpoints/generate_data.py")

    fig, ax = pl.plt.subplots(figsize=(4.6, 3.4))
    for k, (method, pts) in enumerate(sorted(series.items())):
        if not pts:
            continue
        cams = sorted(pts)
        ax.plot(cams, [pts[c] for c in cams], color=pl.SERIES[k % len(pl.SERIES)],
                marker="o", markersize=5, label=method)
    ax.legend(frameon=False)
    cams = sorted(series["ours"]) or [1]
    ax.set_xlabel("viewpoints")
    ax.set_ylabel("sym. Hausdorff")
    ax.set_xscale("log")
    ax.set_xticks(list(cams), [str(c) for c in cams])
    pl.save(fig, os.path.join(d, "figure.png"))
