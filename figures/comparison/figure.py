"""Comparison figure (reference figures/comparison/figure.ipynb): per-scene
image-loss curves for ours vs laplacian-reg vs bilaplacian-reg, final
Hausdorff distances, and final-mesh panels."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import plotting as pl

METHODS = [("ours", "ours"), ("lapreg", "laplacian reg"),
           ("bilapreg", "bilaplacian reg")]

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "comparison")
    scenes = sorted({f.split("_")[0] for f in os.listdir(d)
                     if f.endswith("_loss.csv")}) if os.path.isdir(d) else []
    if not scenes:
        pl.require([os.path.join(d, "suzanne_ours_loss.csv")],
                   "figures/comparison/generate_data.py")

    fig, axes = pl.plt.subplots(2, max(len(scenes), 1),
                                figsize=(3.4 * max(len(scenes), 1), 6.0),
                                squeeze=False)
    for col, scene in enumerate(scenes):
        runs, labels, hausdorffs = [], [], []
        for key, label in METHODS:
            lc = os.path.join(d, f"{scene}_{key}_loss.csv")
            mc = os.path.join(d, f"{scene}_{key}_metrics.csv")
            if not os.path.exists(lc):
                continue
            its, im, _ = pl.read_loss_csv(lc)
            runs.append((label, its, im))
            labels.append(label.split()[0])
            hausdorffs.append(pl.read_metrics_csv(mc)["hausdorff"])
        pl.loss_axes(axes[0][col], runs)
        axes[0][col].set_title(scene)
        pl.bar_axes(axes[1][col], labels, hausdorffs, "sym. Hausdorff")
    pl.save(fig, os.path.join(d, "figure.png"))

    panels = []
    for scene in scenes:
        for key, label in METHODS:
            ply = os.path.join(d, f"{scene}_{key}_final.ply")
            if os.path.exists(ply):
                panels.append((f"{scene} / {label}", ply))
    if panels:
        pl.mesh_grid_figure(os.path.join(d, "meshes.png"), panels,
                            ncols=len(METHODS))
        print(f"wrote {os.path.join(d, 'meshes.png')}")
