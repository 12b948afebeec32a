"""Isolated-op timing of raycast phase 1 (build_tile_candidates) pieces.

The frame budget says phase 1 costs 1.4 ms at 512^3/640x480; this times
each constituent op with realistic shapes so the fix targets the actual
cost (platform facts: gathers ~9 ns/element row / ~3 ns column, sorts
cheap-ish, per-op issue ~0.3-1 us — PERFORMANCE.md).

Timing caveat: ``timeit`` issues ITERS async dispatches with a single
forcing readout at the end and subtracts one fixed 25 ms relay
constant, so host-side dispatch pipelining can skew ABSOLUTE per-op
numbers. Treat results as RELATIVE/A-B comparisons only; force a
readout every few iterations if absolute numbers are ever needed.

Run sequentially (ONE TPU process):
  nohup python scripts/profile_phase1_ops.py > /tmp/p1ops.out 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.config import enable_compilation_cache

enable_compilation_cache()

NB = 64 * 64 * 64  # sub-blocks at 512^3 (SUB_Z=8)
NV = 4096          # MAX_VISIBLE
MP = 16            # MAX_PAIRS
NT = 300           # tiles at 640x480 (60 bands x 5 u-tiles)
MCT = 96           # per-tile budget
ITERS = 30


def readout(x):
    x = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(x.reshape(-1)[:8].astype(jnp.float32)))


def timeit(name, fn, *args):
    out = fn(*args)
    readout(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    readout(out)
    dt = (time.time() - t0 - 0.025) / ITERS * 1000.0
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return out


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ~6% of blocks kept (measured visible fraction at 512^3)
    keep = rng.random(NB) < 0.06
    db_all = rng.integers(0, 256, NB).astype(np.int32)
    sel_key = np.where(keep, db_all, 1 << 24).astype(np.int32)
    sel_key_d = jnp.asarray(sel_key)

    f32_nb = jnp.asarray(rng.random(NB, dtype=np.float32))
    stacked = jnp.asarray(rng.random((10, NB), dtype=np.float32))
    prep_t = jnp.asarray(rng.random((11, NV), dtype=np.float32))
    sel_idx = jnp.asarray(np.sort(rng.choice(NB, NV, replace=False)).astype(np.int32))

    pair_tile = jnp.asarray(rng.integers(0, NT + 1, NV * MP).astype(np.int32))
    pair_key = pair_tile * 256 + jnp.asarray(
        rng.integers(0, 256, NV * MP).astype(np.int32)
    )
    pair_idx = jnp.asarray(
        np.broadcast_to(np.arange(NV, dtype=np.int32)[:, None], (NV, MP)).reshape(-1)
    )
    slot_idx_flat = jnp.asarray(rng.integers(0, NV, NT * MCT).astype(np.int32))
    slot_c = jnp.asarray(rng.integers(0, NV * MP, (NT, MCT)).astype(np.int32))

    timeit("argsort 262K int32 [:4096]",
           jax.jit(lambda k: jnp.argsort(k)[:NV]), sel_key_d)
    timeit("lax.sort 262K (key,idx)",
           jax.jit(lambda k: jax.lax.sort(
               (k, jnp.arange(NB, dtype=jnp.int32)), num_keys=1)), sel_key_d)
    timeit("lax.top_k 262K k=4096",
           jax.jit(lambda k: jax.lax.top_k(-k, NV)), sel_key_d)
    timeit("6x row-gather 4096 from 262K",
           jax.jit(lambda f, s: jnp.stack([f[s], f[s] * 2, f[s] + 1,
                                           f[s] * 3, f[s] - 1, f[s] * 5])),
           f32_nb, sel_idx)
    timeit("column-take (10,262K)->(10,4096)",
           jax.jit(lambda st, s: jnp.take(st, s, axis=1)), stacked, sel_idx)
    timeit("lax.sort 65K x2 ops",
           jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1)),
           pair_key, pair_idx)
    payload = [jnp.asarray(rng.random(NV * MP, dtype=np.float32))
               for _ in range(11)]
    timeit("lax.sort 65K x12 ops (key + 11 f32 payload)",
           jax.jit(lambda k, *fs: jax.lax.sort((k,) + fs, num_keys=1)),
           pair_key, *payload)
    timeit("searchsorted 300 in 65K sorted",
           jax.jit(lambda sk: jnp.searchsorted(
               sk, jnp.arange(NT, dtype=jnp.int32) * 256)),
           jnp.sort(pair_key))
    timeit("counts one-hot (65536,300) sum",
           jax.jit(lambda pt: jnp.sum(
               pt[:, None] == jnp.arange(NT)[None, :], axis=0)), pair_tile)
    timeit("row-gather (NT,MCT)=28800 from 65K",
           jax.jit(lambda si, sc: si[sc.reshape(-1)]), pair_idx, slot_c)
    timeit("column-take (11,4096)->(11,28800)",
           jax.jit(lambda pt, si: jnp.take(pt, si, axis=1)),
           prep_t, slot_idx_flat)
    timeit("transpose (11,300,96)->(300,96,11)+pad+where",
           jax.jit(lambda ct: jnp.where(
               (jnp.arange(MCT)[None, :, None] < 50),
               jnp.pad(jnp.transpose(ct.reshape(11, NT, MCT), (1, 2, 0)),
                       ((0, 0), (0, 0), (0, 5))), 0.0)),
           jnp.asarray(rng.random((11, NT * MCT), dtype=np.float32)))


if __name__ == "__main__":
    main()
