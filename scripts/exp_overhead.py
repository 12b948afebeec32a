"""Pinpoint the streaming-integrate 'copy' overhead: build the kernel up
piece by piece (buffers, mips, SMEM params, copy body) at the bench's
real scale: 4999 active chunks of (8, 8, 128), grid 16384."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512
NBX = R // 8
NZC = R // 128
N = NBX * NBX * NZC
ACTIVE = 4999


def readout(x):
    return float(jnp.sum(x.reshape(-1)[:8]))


def make_wl():
    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(N, ACTIVE, replace=False)).astype(np.int32)
    ci = ids // (NBX * NZC)
    cj = (ids // NZC) % NBX
    ck = ids % NZC
    bi = np.full(N, ci[-1], np.int32)
    bj = np.full(N, cj[-1], np.int32)
    bk = np.full(N, ck[-1], np.int32)
    bi[:ACTIVE], bj[:ACTIVE], bk[:ACTIVE] = ci, cj, ck
    return (jnp.asarray(bi), jnp.asarray(bj), jnp.asarray(bk),
            jnp.asarray([ACTIVE], np.int32))


def run(name, n_vol_pairs, with_planes, with_mips, with_params, body_copy):
    bi, bj, bk, cnt = make_wl()

    n_prefetch = 4
    im_vol = lambda s, bi, bj, bk, cnt: (bi[s], bj[s], bk[s])
    im_pl = lambda s, bi, bj, bk, cnt: (bi[s], bj[s], bk[s], 0, 0)

    in_specs = []
    args = []
    if with_params:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((32,), jnp.float32))
    if with_mips:
        for shape in ((480, 640), (240, 384), (120, 256), (64, 256)):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(jnp.zeros(shape, jnp.float32))
    vols = []
    for _ in range(n_vol_pairs):
        in_specs.append(pl.BlockSpec((8, 8, 128), im_vol))
        vols.append(jnp.zeros((R, R, R), jnp.float32))
    if with_planes:
        in_specs.append(pl.BlockSpec((1, 1, 1, 16, 16), im_pl))
        planes = jnp.zeros((NBX, NBX, NZC, 16, 16), jnp.float32)

    out_specs = [pl.BlockSpec((8, 8, 128), im_vol)] * n_vol_pairs
    out_shape = [jax.ShapeDtypeStruct((R, R, R), jnp.float32)] * n_vol_pairs
    if with_planes:
        out_specs.append(pl.BlockSpec((1, 1, 1, 16, 16), im_pl))
        out_shape.append(
            jax.ShapeDtypeStruct((NBX, NBX, NZC, 16, 16), jnp.float32)
        )

    n_fixed = len(args)
    aliases = {
        n_prefetch + n_fixed + i: i
        for i in range(n_vol_pairs + (1 if with_planes else 0))
    }

    def kernel(*refs):
        refs = list(refs[n_prefetch - 1 + 1:])  # skip bi,bj,bk,cnt? see below
        # refs actually: bi,bj,bk,cnt are scalar-prefetch -> first 4
        pass

    # build kernel dynamically with correct signature
    def kernel(bi_r, bj_r, bk_r, cnt_r, *refs):
        step = pl.program_id(0)
        active = step < cnt_r[0]
        idx = n_fixed
        ins = refs[idx : idx + n_vol_pairs]
        if with_planes:
            pin = refs[idx + n_vol_pairs]
        outs = refs[idx + n_vol_pairs + (1 if with_planes else 0):]

        @pl.when(active)
        def _():
            if body_copy:
                for a, b in zip(ins, outs):
                    b[...] = a[...]
                if with_planes:
                    outs[n_vol_pairs][...] = pin[...]
            else:
                for b in outs[:n_vol_pairs]:
                    b[...] = jnp.zeros((8, 8, 128), jnp.float32)
                if with_planes:
                    outs[n_vol_pairs][...] = jnp.zeros(
                        (1, 1, 1, 16, 16), jnp.float32
                    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
    )

    all_args = args + vols + ([planes] if with_planes else [])
    n_args = len(all_args)

    def wrapped(*xs):
        fixed = xs[:n_fixed]
        rest = xs[n_fixed:]
        return f(bi, bj, bk, cnt, *fixed, *rest)

    donate = tuple(range(n_fixed, n_args))
    jf = jax.jit(wrapped, donate_argnums=donate)
    outs = jf(*all_args)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    readout(outs[0])
    cur = list(all_args[:n_fixed]) + list(outs)
    t0 = time.time()
    for _ in range(20):
        outs = jf(*cur)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        cur = list(all_args[:n_fixed]) + list(outs)
    readout(outs[0])
    dt = (time.time() - t0 - 0.025) / 20 * 1000.0
    print(f"{name:52s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}", flush=True)
    run("1 vol pair, zero body", 1, False, False, False, False)
    run("1 vol pair, copy body", 1, False, False, False, True)
    run("2 vol pairs, copy body", 2, False, False, False, True)
    run("2 vol pairs + planes, copy", 2, True, False, False, True)
    run("2 vol pairs + planes + mips, copy", 2, True, True, False, True)
    run("2 vol pairs + planes + mips + params, copy", 2, True, True, True, True)
