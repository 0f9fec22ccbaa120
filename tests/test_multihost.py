"""Multi-host entry test (SURVEY §2.3 'communication backend'): two
coordinated processes on localhost CPU prove jax.distributed bring-up,
a global mesh spanning processes, per-host reference-image sharding,
cross-process collectives in a jitted loss/grad, and checkpoint
save/load at process_count > 1."""
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "multihost_worker.py"),
             str(port), str(pid), str(nproc), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append([l for l in out.splitlines() if l.startswith("OK ")][-1])

    # both processes computed the same global loss/grad
    l0 = outs[0].split()[1:3]
    l1 = outs[1].split()[1:3]
    assert l0 == l1, (outs[0], outs[1])
    assert "coord=True" in outs[0]
    assert os.path.exists(os.path.join(str(tmp_path), "ck.npz"))
