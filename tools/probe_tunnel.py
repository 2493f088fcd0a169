"""Characterize the tunneled-TPU transport (axon) transfer behavior.

Round-5 finding to verify: two independent training runs hung during the
epoch-0 orbax checkpoint save with the tunnel socket frozen at
bytes_received = 5,349,939,825/826 — suspicion is either (a) a
per-connection cumulative received-bytes cap (~4.98 GiB) after which the
relay silently stops answering, or (b) eager by-value output shipping
making every jitted call download its outputs, so saves/long runs burn
through that budget.

Phases (each prints the delta of bytes_received/bytes_sent across the
process's tunnel sockets, sampled via `ss -tin`):
  1. first tiny op (connection + runtime setup)
  2. jit returning a 64 MB array, result NOT read
  3. same call repeated (is the download per-call?)
  4. np.asarray() of the result (explicit fetch)
  5. donated in-place update op, result not read
  6. loop of big-output calls to push cumulative received bytes — watch
     for the wall (run with PROBE_PUSH_GB=6 to hunt the cap; default 0)

Usage: python tools/probe_tunnel.py   (needs the TPU tunnel; exclusive)
"""

from __future__ import annotations

import json
import os
import subprocess
import time


def sock_counters() -> dict:
    out = subprocess.run(["ss", "-tinp"], capture_output=True, text=True).stdout
    me = f"pid={os.getpid()},"
    recv = sent = 0
    take = False
    for line in out.splitlines():
        if line.startswith("ESTAB") or line.startswith("CLOSE"):
            take = me in line
            continue
        if take:
            for tok in line.split():
                if tok.startswith("bytes_received:"):
                    recv += int(tok.split(":")[1])
                elif tok.startswith("bytes_sent:"):
                    sent += int(tok.split(":")[1])
            take = False
    return {"recv": recv, "sent": sent}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    report = {}
    last = {"recv": 0, "sent": 0}

    def phase(name):
        nonlocal last
        cur = sock_counters()
        d = {"recv_mb": round((cur["recv"] - last["recv"]) / 1e6, 3),
             "sent_mb": round((cur["sent"] - last["sent"]) / 1e6, 3),
             "total_recv_mb": round(cur["recv"] / 1e6, 3)}
        report[name] = d
        print(f"[probe] {name}: {d}", flush=True)
        last = cur

    t0 = time.time()
    dev = jax.devices()[0]
    x = jnp.ones((8,)) + 1
    float(x.sum())
    phase("1_first_tiny_op")

    N = 4096  # 4096*4096 f32 = 64 MB
    big = jax.jit(lambda k: jax.random.normal(k, (N, N)))
    k = jax.random.PRNGKey(0)
    y = big(k)
    # do NOT read y; just wait for dispatch to settle
    y.block_until_ready()
    phase("2_jit_64mb_output_unread")

    y2 = big(jax.random.PRNGKey(1))
    y2.block_until_ready()
    phase("3_jit_64mb_output_unread_again")

    _ = np.asarray(y)
    phase("4_explicit_fetch_64mb")

    upd = jax.jit(lambda a: a * 1.0001, donate_argnums=0)
    y2 = upd(y2)
    y2.block_until_ready()
    phase("5_donated_update_unread")

    push_gb = float(os.environ.get("PROBE_PUSH_GB", "0"))
    if push_gb > 0:
        # drive cumulative received bytes toward the suspected wall with
        # explicit fetches; print progress every ~256 MB
        fetched = 0.0
        i = 2
        t_wall = time.time()
        while fetched < push_gb * 1e9:
            z = big(jax.random.PRNGKey(i))
            i += 1
            _ = np.asarray(z)
            fetched += N * N * 4
            if (i % 4) == 0:
                cur = sock_counters()
                print(f"[probe] pushed {fetched/1e9:.2f} GB, "
                      f"total_recv={cur['recv']/1e9:.3f} GB, "
                      f"t={time.time()-t_wall:.0f}s", flush=True)
        phase("6_push_fetch_loop")

    report["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
