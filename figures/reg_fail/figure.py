"""Regularization-failure figure (reference figures/reg_fail/figure.ipynb):
silhouette-loss curves for ours vs Adam+bilaplacian at three weights, and
the final meshes (the failure is visible as collapsed/creased geometry)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

RUNS = [("ours", "ours (λ=99)"), ("reg_1", "reg w=1"),
        ("reg_400", "reg w=400"), ("reg_10000", "reg w=10000")]

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "reg_fail")
    pl.require([os.path.join(d, "ours_loss.csv")],
               "figures/reg_fail/generate_data.py")
    runs = []
    for key, label in RUNS:
        lc = os.path.join(d, f"{key}_loss.csv")
        if os.path.exists(lc):
            its, im, _ = pl.read_loss_csv(lc)
            runs.append((label, its, im))
    fig, ax = pl.plt.subplots(figsize=(5.2, 3.6))
    pl.loss_axes(ax, runs, ylabel="silhouette loss")
    pl.save(fig, os.path.join(d, "figure.png"))

    panels = [(label, os.path.join(d, f"{key}_final.ply"))
              for key, label in RUNS
              if os.path.exists(os.path.join(d, f"{key}_final.ply"))]
    if panels:
        pl.mesh_grid_figure(os.path.join(d, "meshes.png"), panels)
        print(f"wrote {os.path.join(d, 'meshes.png')}")
