"""Row-take vs column-take+transpose for the phase-1 slot build.

The (11, 28800) column-take lands FIELD-major and needs a (11, nt, mct)
-> (nt, mct, 11-pad-16) transpose the TPU relayouts at ~0.68 ms; taking
ROWS from a (nv, 16) row-major prep table would land directly in the
kernel's (nt, mct, 16) layout. This measures whether wide-row gathers
(16 lanes/row) run at bandwidth or near-scalar on this backend.

Run sequentially (ONE TPU process):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
      scripts/profile_phase1_row_take.py > /tmp/p1rt.out 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from housescan_tpu.config import enable_compilation_cache

enable_compilation_cache()

NV = 4096
NT = 300
MCT = 96
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
    prep_rows = jnp.asarray(rng.random((NV, 16), dtype=np.float32))
    prep_cols = jnp.asarray(rng.random((11, NV), dtype=np.float32))
    slot_idx = jnp.asarray(rng.integers(0, NV, NT * MCT).astype(np.int32))
    slot_ok = jnp.asarray(rng.random((NT, MCT)) < 0.5)

    timeit("row-take (4096,16) x 28800 -> (28800,16)",
           jax.jit(lambda p, s: jnp.take(p, s, axis=0)), prep_rows, slot_idx)
    timeit("row-take + where + reshape (nt,mct,16)",
           jax.jit(lambda p, s, ok: jnp.where(
               ok[..., None],
               jnp.take(p, s, axis=0).reshape(NT, MCT, 16), 0.0)),
           prep_rows, slot_idx, slot_ok)
    timeit("col-take (11,4096)->(11,28800) + transpose+pad+where",
           jax.jit(lambda p, s, ok: jnp.where(
               ok[..., None],
               jnp.pad(jnp.transpose(
                   jnp.take(p, s, axis=1).reshape(11, NT, MCT), (1, 2, 0)),
                   ((0, 0), (0, 0), (0, 5))), 0.0)),
           prep_cols, slot_idx, slot_ok)


if __name__ == "__main__":
    main()
