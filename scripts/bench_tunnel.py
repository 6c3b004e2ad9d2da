#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Raw device-tunnel bandwidth probe: D2H / H2D, concurrency, compute overlap.

The whole-globe e2e steady state is bound by the device->host link on this
host (scripts/bench_globe_transport.py). This probe measures the link
honestly (computed, non-constant arrays — constants get elided) and answers
two design questions for the pipelined sweep:

  1. Do two concurrent fetches multiplex (2 threads ~2x one)?
  2. Does a fetch proceed at full speed while the chip is computing?

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_tunnel.py
"""
from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def fetch(x) -> float:
    t0 = time.perf_counter()
    np.asarray(x)
    return time.perf_counter() - t0


def main() -> None:
    r = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k, i: jax.random.normal(jax.random.fold_in(k, i), (8, 1_119_000), jnp.float16))
    arrs = [mk(r, i) for i in range(6)]
    jax.block_until_ready(arrs)
    mb = arrs[0].size * 2 / 1e6

    # warm the fetch path
    fetch(arrs[0])

    # 1) serial D2H
    ts = [fetch(a) for a in arrs[1:3]]
    for t in ts:
        print(f"# D2H serial: {mb:.1f} MB in {t:.2f}s = {mb / t:.1f} MB/s")

    # 2) two concurrent fetches
    with ThreadPoolExecutor(max_workers=2) as pool:
        t0 = time.perf_counter()
        list(pool.map(fetch, arrs[3:5]))
        t2 = time.perf_counter() - t0
    print(f"# D2H 2-concurrent: {2 * mb:.1f} MB in {t2:.2f}s = {2 * mb / t2:.1f} MB/s combined")

    # 3) fetch while the chip computes (a long matmul chain)
    @jax.jit
    def burn(x, n):
        def body(i, x):
            return jnp.tanh(x @ x) * 0.999

        return jax.lax.fori_loop(0, n, body, x)

    x = jax.random.normal(r, (4096, 4096), jnp.bfloat16)
    burn_n = 400
    jax.block_until_ready(burn(x, 2))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(burn(x, burn_n))
    t_burn = time.perf_counter() - t0
    print(f"# compute-only burn: {t_burn:.2f}s")

    out = burn(x, burn_n)  # async dispatch
    t0 = time.perf_counter()
    t_f = fetch(arrs[5])
    jax.block_until_ready(out)
    t_total = time.perf_counter() - t0
    print(f"# fetch during compute: fetch {mb:.1f} MB took {t_f:.2f}s "
          f"({mb / t_f:.1f} MB/s); burn+fetch wall {t_total:.2f}s "
          f"(vs burn alone {t_burn:.2f}s)")

    # 4) H2D for completeness (computed host data)
    h = np.random.default_rng(0).normal(size=(8, 360, 720, 1)).astype(np.float16)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(h))
    t_u = time.perf_counter() - t0
    print(f"# H2D: {h.nbytes / 1e6:.1f} MB in {t_u:.2f}s = {h.nbytes / 1e6 / t_u:.1f} MB/s")


if __name__ == "__main__":
    main()
