"""Multi-host (DCN) distributed initialization test.

SURVEY.md §2.8: "Multi-host DCN handled by the same mesh (jax.distributed)".
This exercises the REAL multi-process path on one box: two OS processes, each
with 4 emulated CPU devices, form a jax.distributed cluster through
``parallel.init_distributed``; the global 8-device process-major ``data`` mesh
runs one data-parallel pretrain step on a globally-sharded batch. Both
processes must report the same finite loss — which requires the gradient
reduction to have crossed the process boundary (the DCN hop on a real pod).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultiHost:
    def test_two_process_data_parallel_step(self):
        worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
        coordinator = f"127.0.0.1:{_free_port()}"
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, worker, coordinator, "2", str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multi-host worker timed out")
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)
        losses = []
        for out in outs:
            lines = [ln for ln in out.splitlines() if ln.startswith("LOSS ")]
            assert lines, f"no LOSS line in: {out!r}"
            losses.append(float(lines[-1].split()[1]))
        # identical loss on both processes => the global reduction happened
        assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses
