"""Worker process for the 2-process multi-host test (run by
test_multihost.py, once per process id).

Proves, at process_count=2 on multi-process CPU: distributed bring-up,
global ('dp','sp') mesh construction spanning processes, reference-image
sharding from per-host local slices, a sharded render-loss computation with
cross-process collectives, and coordinator-only checkpoint save + all-
process load.  Prints one final line ``OK <loss> <grad_norm>`` that the
parent compares across processes and against the single-process value.
"""
import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    ckpt_dir = sys.argv[4]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from largesteps_tpu.parallel.distributed import (
        init_distributed, global_mesh, host_local_to_global,
        replicate_global, save_checkpoint_multihost, sync, is_coordinator)

    jax = init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid, local_device_count=2, platform="cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    mesh = global_mesh(sp=1)
    assert mesh.shape == {"dp": 2 * nproc, "sp": 1}, mesh.shape

    # deterministic "reference images": cameras sharded over dp, two cameras
    # per device -> 4 per process at nproc=2
    n_cam_global = 2 * len(jax.devices())
    cams_per_proc = n_cam_global // nproc
    H = W = 8
    full = (np.arange(n_cam_global * H * W, dtype=np.float32)
            .reshape(n_cam_global, H, W)) / (n_cam_global * H * W)
    local = full[pid * cams_per_proc:(pid + 1) * cams_per_proc]
    ref = host_local_to_global(mesh, P("dp"), local)
    assert ref.shape == (n_cam_global, H, W), ref.shape

    theta = replicate_global(mesh, {"v": np.full((16, 3), 0.25, np.float32)})

    @jax.jit
    def loss_and_grad(theta, ref):
        def loss(theta):
            # per-camera "render" of the replicated params + global mean:
            # the mean over the dp-sharded camera axis is the cross-process
            # psum GSPMD must insert
            imgs = jnp.sin(theta["v"].sum()) + ref
            return jnp.square(imgs).mean()
        l, g = jax.value_and_grad(loss)(theta)
        return l, g

    l, g = loss_and_grad(theta, ref)
    gnorm = jnp.linalg.norm(g["v"])

    # expected value, computed redundantly on host from the FULL data
    exp_imgs = np.sin(0.25 * 16 * 3) + full
    exp_loss = float(np.square(exp_imgs).mean())
    assert abs(float(l) - exp_loss) < 1e-5, (float(l), exp_loss)

    # coordinator-only checkpoint; everyone loads it back after the barrier
    path = os.path.join(ckpt_dir, "ck.npz")
    save_checkpoint_multihost(
        path, theta={"v": np.asarray(l) * np.ones((4,), np.float32)},
        opt_state=(), v_src=np.zeros((3, 3), np.float32),
        f_src=np.zeros((1, 3), np.int32), step=7, step_size=0.05,
        remesh_schedule=[11, 22])
    from largesteps_tpu.driver.checkpoint import load_checkpoint
    data = load_checkpoint(path)
    assert data["meta"]["step"] == 7
    assert data["meta"]["remesh_schedule"] == [11, 22]
    sync("done")

    print(f"OK {float(l):.8f} {float(gnorm):.8f} coord={is_coordinator()}",
          flush=True)


if __name__ == "__main__":
    main()
