"""Teaser figure (reference figures/teaser/figure.ipynb): the four methods'
final meshes side by side with their loss curves and Hausdorff distances."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

METHODS = [("ours", "ours"), ("ours_remesh", "ours + remesh"),
           ("reg", "regularized"), ("naive", "naive")]

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "teaser")
    pl.require([os.path.join(d, "ours_loss.csv")],
               "figures/teaser/generate_data.py")
    runs, labels, dists = [], [], []
    for key, label in METHODS:
        lc = os.path.join(d, f"{key}_loss.csv")
        if not os.path.exists(lc):
            continue
        its, im, _ = pl.read_loss_csv(lc)
        runs.append((label, its, im))
        labels.append(label)
        dists.append(pl.read_metrics_csv(
            os.path.join(d, f"{key}_metrics.csv"))["hausdorff"])

    fig, (ax0, ax1) = pl.plt.subplots(1, 2, figsize=(9.2, 3.6))
    pl.loss_axes(ax0, runs)
    pl.bar_axes(ax1, [l.split()[0] for l in labels], dists, "sym. Hausdorff")
    pl.save(fig, os.path.join(d, "figure.png"))

    panels = [(label, os.path.join(d, f"{key}_final.ply"))
              for key, label in METHODS
              if os.path.exists(os.path.join(d, f"{key}_final.ply"))]
    if panels:
        pl.mesh_grid_figure(os.path.join(d, "meshes.png"), panels)
        print(f"wrote {os.path.join(d, 'meshes.png')}")
