"""Multi-host DCN test (VERDICT r2 #5): two OS processes, each with 2 CPU
devices, bootstrap via the production ``init_distributed()`` hook
(parallel/mesh.py) and run the production ``Trainer.train_pass_fn`` over the
4-device global dp mesh; the loss trajectory must match a single-process run
bit-for-bit. The reference has no multi-process anything (SURVEY.md §2.4) —
this is a new-capability test, our substitute for a real multi-host slice."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_dcn_worker.py")


def _run(env_extra, timeout=900):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update(env_extra)
    return subprocess.Popen([sys.executable, WORKER], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def _losses(output):
    for line in output.splitlines():
        if line.startswith("LOSSES:"):
            return json.loads(line[len("LOSSES:"):])
    raise AssertionError(f"no LOSSES line in worker output:\n{output}")


@pytest.mark.slow
def test_two_process_dcn_matches_single_process():
    # single-process baseline on an equal-size (4-device) mesh
    proc = _run({"DCN_LOCAL_DEVICES": "4"})
    out, _ = proc.communicate(timeout=900)
    assert proc.returncode == 0, out
    base = _losses(out)
    assert base["n_processes"] == 1 and base["n_devices"] == 4

    # two processes x 2 local devices, coordinated over the
    # jax.distributed service (the DCN path)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        _run({
            "DCN_LOCAL_DEVICES": "2",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(i),
        })
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    dist = _losses(outs[0])
    assert dist["n_processes"] == 2 and dist["n_devices"] == 4

    np.testing.assert_array_equal(np.asarray(base["losses"]),
                                  np.asarray(dist["losses"]))
    assert base["leaf0_sum"] == dist["leaf0_sum"]
