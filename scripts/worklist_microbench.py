"""Microbench: scalar-prefetch work-list mechanics on the real TPU.

1. Idle-step overhead: grid of N steps whose index_map repeats one block
   (consecutive identical index => DMA elided). Measures per-step cost.
2. Aliasing semantics: with input_output_aliases, do blocks never visited
   by the grid retain the INPUT contents?
3. Work-list streaming: visit a prefetched subset of blocks, check
   content + timing.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8]))


NB = 4096  # blocks of (8, 8, 512) ~ 512^3
CAP = 16384


def idle_kernel(wl, cnt, x_in, x_out):
    step = pl.program_id(0)

    @pl.when(step < cnt[0])
    def _():
        x_out[...] = x_in[...] + 1.0


def run_case(name, n_real, vol_blocks=NB):
    """Visit the first n_real blocks per the work list; rest padded."""
    x = jnp.zeros((vol_blocks * 8, 8, 512), jnp.float32)
    wl = np.zeros((CAP,), np.int32)
    wl[:n_real] = np.arange(n_real)
    wl[n_real:] = max(n_real - 1, 0)
    wl = jnp.asarray(wl)
    cnt = jnp.asarray([n_real], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(CAP,),
        in_specs=[pl.BlockSpec((8, 8, 512), lambda s, wl, cnt: (wl[s], 0, 0))],
        out_specs=pl.BlockSpec((8, 8, 512), lambda s, wl, cnt: (wl[s], 0, 0)),
    )

    f = pl.pallas_call(
        idle_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={2: 0},
    )

    jf = jax.jit(lambda x, wl, cnt: f(wl, cnt, x), donate_argnums=(0,))
    x = jf(x, wl, cnt)
    readout(x)
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        x = jf(x, wl, cnt)
    readout(x)
    dt = (time.time() - t0 - 0.025) / iters * 1000.0
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return x


def main():
    print(f"# backend={jax.default_backend()}", flush=True)

    # correctness: visit only even blocks of a small volume; odd blocks
    # must retain input contents through the alias.
    nb = 16
    x = jnp.arange(nb * 8 * 8 * 512, dtype=jnp.float32).reshape(nb * 8, 8, 512)
    x0 = np.asarray(x)
    wl = np.full((64,), 2 * (nb // 2 - 1), np.int32)
    wl[: nb // 2] = np.arange(0, nb, 2)
    cnt = jnp.asarray([nb // 2], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(64,),
        in_specs=[pl.BlockSpec((8, 8, 512), lambda s, wl, cnt: (wl[s], 0, 0))],
        out_specs=pl.BlockSpec((8, 8, 512), lambda s, wl, cnt: (wl[s], 0, 0)),
    )
    f = pl.pallas_call(
        idle_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={2: 0},
    )
    y = jax.jit(lambda x, wl, cnt: f(wl, cnt, x), donate_argnums=(0,))(
        x, jnp.asarray(wl), cnt
    )
    y = np.asarray(y)
    even_ok = np.array_equal(y[0 * 8 : 1 * 8], x0[0 * 8 : 1 * 8] + 1.0)
    odd_ok = np.array_equal(y[1 * 8 : 2 * 8], x0[1 * 8 : 2 * 8])
    last_pad = np.array_equal(
        y[(nb - 2) * 8 : (nb - 1) * 8], x0[(nb - 2) * 8 : (nb - 1) * 8] + 1.0
    )  # padded revisits must not double-apply
    print(f"# visited updated once: {even_ok and last_pad}; "
          f"unvisited retained: {odd_ok}", flush=True)

    run_case("all 4096 blocks + 12288 padded steps", NB)
    run_case("1280 blocks (31%) + 15104 padded", 1280)
    run_case("1 block + 16383 padded (pure idle)", 1)


if __name__ == "__main__":
    main()
