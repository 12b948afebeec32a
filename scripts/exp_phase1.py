"""Time the raycast phase-1 building blocks on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8].astype(jnp.float32)))


def timeit(name, fn, *args, iters=20):
    jf = jax.jit(fn)
    out = jf(*args)
    readout(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = jf(*args)
    readout(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0 - 0.025) / iters * 1000.0
    print(f"{name:52s} {dt:8.3f} ms", flush=True)


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    NB = 262144
    keep = jnp.asarray(rng.random(NB) < 0.03)
    timeit("argsort bool (262K) [nv selection]", lambda k: jnp.argsort(~k), keep)

    pairs = jnp.asarray(rng.integers(0, 301, 262144).astype(np.int32))
    timeit("argsort int32 (262K) [pair sort]", jnp.argsort, pairs)
    pairs64 = jnp.asarray(rng.integers(0, 301, 65536).astype(np.int32))
    timeit("argsort int32 (65K)", jnp.argsort, pairs64)

    prep = jnp.asarray(rng.random((NB, 16), np.float32))
    slots = jnp.asarray(rng.integers(0, NB, (300, 96)).astype(np.int32))
    timeit("row gather (300,96) x16 from 262K", lambda p, s: p[s], prep, slots)

    prep10 = prep[:, :10]
    timeit("row gather (300,96) x10 from 262K", lambda p, s: p[s], prep10, slots)

    prep_small = jnp.asarray(rng.random((8192, 16), np.float32))
    slots_s = jnp.asarray(rng.integers(0, 8192, (300, 96)).astype(np.int32))
    timeit("row gather (300,96) x16 from 8K", lambda p, s: p[s], prep_small, slots_s)

    # transposed gather: take columns instead of rows
    prepT = jnp.asarray(rng.random((16, NB), np.float32))
    timeit("col gather x16 (take axis=1)",
           lambda p, s: jnp.take(p, s.reshape(-1), axis=1), prepT, slots)

    # sort with payload: one key + 16 payload operands
    keys = pairs
    ops = [jnp.asarray(rng.random(NB, np.float32)) for _ in range(16)]
    timeit("lax.sort key + 16 payloads (262K)",
           lambda k, *o: jax.lax.sort((k,) + o, num_keys=1)[1], keys, *ops)

    # one-hot matmul gather per band: 60 x [(480,8192)@(8192,16)]
    sel_ids = jnp.asarray(rng.integers(0, 8192, (60, 480)).astype(np.int32))

    def onehot_gather(p, ids):
        oh = (ids[..., None] == jnp.arange(8192)[None, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("bsk,kf->bsf", oh, p.astype(jnp.bfloat16))

    timeit("one-hot bf16 matmul gather (60x480 from 8K)",
           onehot_gather, prep_small, sel_ids)

    timeit("cumsum int32 (262K)", lambda k: jnp.cumsum(k.astype(jnp.int32)), keep)
    timeit("searchsorted (262K keys, 300 q)",
           lambda s: jnp.searchsorted(s, jnp.arange(300)), jnp.sort(pairs))


if __name__ == "__main__":
    main()
