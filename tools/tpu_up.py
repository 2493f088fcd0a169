"""Bounded TPU-tunnel health probe: exit 0 iff a tiny matmul round-trips.

The axon tunnel has a failure mode where the local relay accepts
connections but the far side never replies — a fresh client then hangs
forever inside its first compile RPC with no TCP socket visible (the
lost-reply mode documented in tools/watchdog_chain.sh). A probe therefore
has to be a separate short-lived process under `timeout`, not an in-process
check. run_eval_chain.sh / run_tpu_queue.sh call this between retries so
they stop burning attempts (and stop spawning unkillable hung CLIs) while
the tunnel is down.

Usage: timeout 180 python tools/tpu_up.py   # rc 0 = healthy
"""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    y = float((x @ x).sum())
    ok = abs(y - 128.0 ** 3) < 1e-3
    print(f"tpu_up: matmul={y} ok={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
