"""Multihost (multi-process SPMD) training verification.

Two real jax.distributed CPU processes (2 local devices each, Gloo
collectives) train over a 4-device global data mesh with the production
multihost path: per-host row-sliced batches, global-array assembly
(`make_array_from_process_local_data` / `make_array_from_callback`), and
the multi-step scan with accumulation windows. Final params must match a
single-process run on the same (permuted) global batches.

This is the DistributedSampler/DDP-equivalent proof the reference only had
implicitly through torch (otrans/train/trainer.py:57-62) — here it runs in
CI on the CPU backend.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc, local_devs, out_dir, spe, accum, timeout=600):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    outs = [os.path.join(out_dir, f"params_{nproc}p_{i}.npz") for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(nproc),
             str(local_devs), outs[i], str(spe), str(accum)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return outs[0]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    ref = _run_workers(1, 4, str(tmp_path), spe=2, accum=2)
    multi = _run_workers(2, 2, str(tmp_path), spe=2, accum=2)

    a = np.load(ref)
    b = np.load(multi)
    assert set(a.files) == set(b.files)
    assert int(a["__global_step__"]) == int(b["__global_step__"]) == 4
    for k in a.files:
        np.testing.assert_allclose(
            a[k], b[k], rtol=1e-4, atol=1e-5,
            err_msg=f"{k} diverged between 1-process and 2-process runs",
        )
