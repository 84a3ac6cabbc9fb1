"""Block until the axon TPU tunnel answers, then exit 0.

The pool tunnel goes Unavailable for stretches; jax init then blocks for
~25 min before raising.  This pings with a short-lived subprocess per
attempt (jax backends are process-global — a failed init poisons the
process) so each retry is clean.

Usage: python scripts/tpu_wait.py [--interval 180] [--max-hours 6]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time

PING = (
    "import jax, jax.numpy as jnp; "
    "d = jax.devices()[0]; "
    "x = jax.device_put(jnp.ones((8, 8), jnp.float32), d); "
    "print('TPU_OK', d, float(jnp.sum(x)))"
)


def wait_for_tpu(interval: float = 180.0, max_seconds: float = 6 * 3600,
                 attempt_timeout: float = 300.0, quiet: bool = False) -> bool:
    """Ping until the tunnel answers; True if it came up within the budget.

    The first attempt runs immediately, so a healthy tunnel costs one
    short subprocess (~15 s jax init) and no sleep.
    """
    t0 = time.time()
    n = 0
    while True:
        n += 1
        try:
            r = subprocess.run([sys.executable, "-c", PING],
                               capture_output=True, text=True,
                               timeout=attempt_timeout)
        except subprocess.TimeoutExpired:
            r = None
        if r is not None and r.returncode == 0 and "TPU_OK" in r.stdout:
            if not quiet:
                print(f"tunnel up after {time.time() - t0:.0f}s "
                      f"({n} attempts): {r.stdout.strip()}",
                      file=sys.stderr, flush=True)
            return True
        if time.time() - t0 >= max_seconds:
            if not quiet:
                print("gave up", file=sys.stderr, flush=True)
            return False
        msg = "" if r is None else (r.stderr.strip().splitlines() or [""])[-1]
        if not quiet:
            print(f"attempt {n} ({time.time() - t0:.0f}s): down "
                  f"{msg[:120]}", file=sys.stderr, flush=True)
        time.sleep(interval)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--attempt-timeout", type=float, default=300.0)
    args = ap.parse_args()
    return 0 if wait_for_tpu(args.interval, args.max_hours * 3600,
                             args.attempt_timeout) else 1


if __name__ == "__main__":
    sys.exit(main())
