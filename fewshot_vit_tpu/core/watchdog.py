"""Hang-proof re-exec guard for device-touching CLI tools.

On this box the TPU is reached through a device relay; when its tunnel is
down, the first backend initialization (``jax.devices()`` / ``device_put``)
blocks forever inside a GIL-holding C call where neither SIGALRM handlers
nor watchdog threads can run — only an external kill works. A hung tool is
worse than a failed one, so every timing/benchmark entry point re-execs
itself as a killable child and fails loudly on timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys

_ENV_KEY = "_FEWSHOT_WATCHDOG_CHILD"


def watchdog_reexec(timeout_s: float = 1500.0) -> None:
    """Re-exec the current script (same argv) as a killable child and exit
    with its status; inside the child (env-marked) return immediately.

    Call FIRST in ``main()``, before any jax backend touch. ``timeout_s``
    bounds the child's wall clock; on expiry the child is killed and the
    parent exits 2 with a pointed message.
    """
    if os.environ.get(_ENV_KEY) == "1":
        return
    env = dict(os.environ)
    env[_ENV_KEY] = "1"
    # `python -m pkg.mod` sets argv[0] to the module FILE; re-execing that
    # path directly would drop the package context and break relative
    # imports — reconstruct the -m form from __main__'s spec instead.
    import __main__

    spec = getattr(__main__, "__spec__", None)
    if spec is not None and spec.name:
        cmd = [sys.executable, "-m", spec.name] + sys.argv[1:]
    else:
        cmd = [sys.executable] + sys.argv
    try:
        proc = subprocess.run(cmd, env=env, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"watchdog: no result after {timeout_s:.0f}s "
              "(device relay unreachable?)", file=sys.stderr, flush=True)
        sys.exit(2)
    sys.exit(proc.returncode)
