"""Multiscale figure (reference figures/multiscale/figure.ipynb): the loss
trajectory across the remesh schedule, remesh events marked, plus the final
mesh."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import plotting as pl

REMESH = [500, 1500, 3000, 4500, 7000, 10000, 12000, 14000]

if __name__ == "__main__":
    d = os.path.join(pl.OUTPUT_DIR, "multiscale")
    lc = os.path.join(d, "multiscale_loss.csv")
    pl.require([lc], "figures/multiscale/generate_data.py")
    its, im, _ = pl.read_loss_csv(lc)

    fig, ax = pl.plt.subplots(figsize=(6.4, 3.6))
    pl.loss_axes(ax, [("ours + remeshing", its, im)])
    for r in REMESH:
        if r < its[-1]:
            ax.axvline(r, color=pl.GRID, linewidth=1.0, zorder=1)
    ax.set_title("remesh events marked")
    pl.save(fig, os.path.join(d, "figure.png"))

    ply = os.path.join(d, "multiscale_final.ply")
    if os.path.exists(ply):
        pl.mesh_panel(ply, os.path.join(d, "final_mesh.png"))
        print(f"wrote {os.path.join(d, 'final_mesh.png')}")
