"""Fused Pallas MSM: contiguous windowed-table reduction.

TPU-native replacement for the bucketed-Pippenger path of
``ops/msm.py`` (the reference's ecmult_pippenger_wnaf,
src/ecmult_impl.h:516-621).  Round-5 profiling on v5e showed the
sort+segmented-scan shape is layout-bound, not compute-bound: a
contiguous 512k-lane complete add costs ~2.9 ms but the scan's
stride-2 even/odd compaction pays a ~10x HBM relayout penalty at the
XLA->Mosaic materialization boundary (104 ms vs 11 ms per level), and
Mosaic cannot lower strided lane slices at all.  So the TPU shape here
avoids data-dependent placement entirely:

* per-point 15-entry TRUE-AFFINE tables (d*P for d=1..15), built once
  by a kernel with the z-ratio chain + one divsteps inverse per lane
  (the same effective-affine trick as the GLV verify kernel,
  ge_table_set_globalz / src/group_impl.h:289);
* 64 unsigned 4-bit windows; for each, a fused grid-sequential kernel
  gathers each lane's digit entry with a full-table cmov scan
  (src/ecmult_gen_impl.h:237 shape) and accumulates blocks of lanes
  into a VMEM-resident accumulator — one MIXED add per lane per
  window, no sorting, no scatter, every memory access contiguous;
* a batched lane-halving roll-reduce collapses each window's
  accumulator lanes, and a 1-lane Horner scan applies the 4 doublings
  per window (the running-sum reduction's role,
  src/ecmult_impl.h:572-588).

Cost per point: 64 mixed window adds + ~15 table adds + one shared
inverse — all at the contiguous-add rate.  Measured round 5 (2^20
points, one v5e chip): ~8x the sort+scan path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_field import LIMBS, _canon_p, auto_tb
from .pallas_group import (FE, JP, MASK16, _add_aff_ratio, _fe_const,
                           fe_mul, fe_select, fe_sqr, fe_weak,
                           jp_add, jp_add_aff, jp_double)

NENT = 15          # table entries 1..15 (unsigned 4-bit digits)
NWIN = 64          # 256 / 4
_P = 2 ** 256 - 2 ** 32 - 977
# G's coordinates seed the table build on infinity lanes (their gather
# is masked off via the inf flag), mirroring the GLV kernel.
_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def _cl(x: int):
    return tuple((x >> (16 * i)) & 0xFFFF for i in range(16))


def _table_kernel(px_ref, py_ref, pinf_ref, tab_ref):
    """Affine d*P table, d = 1..NENT, per lane.

    Jacobian chain with z-ratio tracking, one divsteps inverse of the
    global Z, backward globalz pass -> true affine; output layout
    [NENT*32, tb]: entry t occupies rows [32t, 32t+32) as x||y limbs."""
    from .pallas_divsteps import inv_limbs16

    tb = px_ref.shape[-1]
    pinf = pinf_ref[0, :] != 0
    px_in = FE([px_ref[i, :] for i in range(LIMBS)], MASK16)
    py_in = FE([py_ref[i, :] for i in range(LIMBS)], MASK16)
    px = fe_select(pinf, _fe_const(px_in.l[0], _cl(_GX)), px_in)
    py = fe_select(pinf, _fe_const(px_in.l[0], _cl(_GY)), py_in)

    one = FE([jnp.zeros_like(px.l[0]) + 1]
             + [jnp.zeros_like(px.l[0])] * (LIMBS - 1), MASK16)
    NT = NENT + 1
    X = [None] * NT
    Y = [None] * NT
    R = [None] * NT                     # z-ratios: z_d = z_{d-1} * r_d
    X[1], Y[1] = fe_weak(px), fe_weak(py)
    d2 = jp_double(JP(px, py, one, jnp.zeros_like(px.l[0])))
    X[2], Y[2] = d2.x, d2.y
    R[2] = d2.z
    pz = d2.z
    for d in range(3, NT):
        X[d], Y[d], pz, R[d] = _add_aff_ratio(X[d - 1], Y[d - 1],
                                              pz, px, py)
    zi = FE(inv_limbs16(_canon_p(fe_weak(pz).l), _P), MASK16)
    zi2 = fe_sqr(zi)
    zi3 = fe_mul(zi2, zi)

    def store(d, ax, ay):
        for i in range(LIMBS):
            tab_ref[32 * (d - 1) + i, :] = ax.l[i]
            tab_ref[32 * (d - 1) + LIMBS + i, :] = ay.l[i]

    store(NT - 1, fe_mul(X[NT - 1], zi2), fe_mul(Y[NT - 1], zi3))
    acc = None
    for d in range(NT - 2, 0, -1):
        acc = R[d + 1] if acc is None else fe_mul(acc, R[d + 1])
        a2 = fe_sqr(acc)
        store(d, fe_mul(fe_mul(X[d], a2), zi2),
              fe_mul(fe_mul(Y[d], fe_mul(a2, acc)), zi3))


@lru_cache(maxsize=4)
def _table_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(px, py, pinf):
        B = px.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _table_kernel,
            out_shape=jax.ShapeDtypeStruct((NENT * 32, B), jnp.uint32),
            grid=(B // tb,),
            in_specs=[spec, spec,
                      pl.BlockSpec((1, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NENT * 32, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(px, py, pinf)

    return run


def _winreduce_kernel(dig_ref, tab_ref, pinf_ref,
                      ox_ref, oy_ref, oz_ref, oinf_ref, *, nblk: int):
    """Grid (NWIN, nblk), second axis sequential: gather each lane's
    digit entry from its affine table (full-table cmov scan) and fold
    the block into this window's VMEM accumulator (one complete MIXED
    add per lane); the accumulator is the revisited output block."""
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    dg = dig_ref[0, :]
    pinf = pinf_ref[0, :]

    # gather: stacked [32, tb] select chain over the 15 entries
    acc = tab_ref[0:32, :]
    for e in range(2, NENT + 1):
        m = (dg == e)[None, :]
        acc = jnp.where(m, tab_ref[32 * (e - 1):32 * e, :], acc)
    gx = FE([acc[i] for i in range(LIMBS)], MASK16)
    gy = FE([acc[LIMBS + i] for i in range(LIMBS)], MASK16)
    g_inf = ((dg == 0) | (pinf != 0)).astype(jnp.uint32)

    one = FE([jnp.zeros_like(dg) + 1]
             + [jnp.zeros_like(dg)] * (LIMBS - 1), MASK16)

    @pl.when(b == 0)
    def _init():
        gxw, gyw = fe_weak(gx), fe_weak(gy)
        for i in range(LIMBS):
            ox_ref[i, :] = gxw.l[i]
            oy_ref[i, :] = jnp.where(g_inf != 0, one.l[i], gyw.l[i])
            oz_ref[i, :] = one.l[i]
        oinf_ref[0, :] = g_inf

    @pl.when(b != 0)
    def _fold():
        a = JP(FE([ox_ref[i, :] for i in range(LIMBS)], MASK16),
               FE([oy_ref[i, :] for i in range(LIMBS)], MASK16),
               FE([oz_ref[i, :] for i in range(LIMBS)], MASK16),
               oinf_ref[0, :])
        out = jp_add_aff(a, gx, gy, g_inf)
        oxw, oyw, ozw = fe_weak(out.x), fe_weak(out.y), fe_weak(out.z)
        for i in range(LIMBS):
            ox_ref[i, :] = oxw.l[i]
            oy_ref[i, :] = oyw.l[i]
            oz_ref[i, :] = ozw.l[i]
        oinf_ref[0, :] = out.inf


@lru_cache(maxsize=4)
def _winreduce_call(tb: int, nblk: int, nwin: int):
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(digs, tab, pinf):
        # digs arrives [nwin, npad] -> flatten to one row so the (1, tb)
        # block spans the full first dim (Mosaic block constraint);
        # block column index = w * nblk + b.  Same for the inf output.
        digs1 = digs.reshape(1, nwin * nblk * tb)
        spec_o16 = pl.BlockSpec((LIMBS, tb), lambda w, b: (w, 0),
                                memory_space=pltpu.VMEM)
        ox, oy, oz, oinf = pl.pallas_call(
            partial(_winreduce_kernel, nblk=nblk),
            out_shape=(
                jax.ShapeDtypeStruct((nwin * LIMBS, tb), jnp.uint32),
                jax.ShapeDtypeStruct((nwin * LIMBS, tb), jnp.uint32),
                jax.ShapeDtypeStruct((nwin * LIMBS, tb), jnp.uint32),
                jax.ShapeDtypeStruct((1, nwin * tb), jnp.uint32),
            ),
            grid=(nwin, nblk),
            in_specs=[
                pl.BlockSpec((1, tb), lambda w, b: (0, w * nblk + b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NENT * 32, tb), lambda w, b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb), lambda w, b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                spec_o16, spec_o16, spec_o16,
                pl.BlockSpec((1, tb), lambda w, b: (0, w),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(digs1, tab, pinf)
        return ox, oy, oz, oinf.reshape(nwin, tb)

    return run


def _finish_kernel(x_ref, y_ref, z_ref, inf_ref,
                   ox_ref, oy_ref, oz_ref, oinf_ref, s_ref,
                   *, tb: int, chunk: int, nchunk: int):
    """Fold each window's tb accumulator lanes down to 128 (static
    contiguous halvings staged through a VMEM scratch ref) and apply
    the Horner recurrence R = 16*R + S_w (MSB-first) on a
    128-lane-spread accumulator — one kernel replacing the ~54 ms
    unfused tail (round-5 phase profile: lane_reduce 12 ms + a 64-step
    1-lane Horner scan 42 ms, at any N).

    All values are kept 2-D ([1, w] rows): Mosaic's layout inference
    aborts on 1-D vectors at 128-lane width, and its roll lowering
    cannot handle sub-tile offsets — hence ref-staged halvings, not
    rolls.  Grid (nchunk,) sequential, descending window order; the
    output block is the revisited [16, 128] Horner accumulator, whose
    lanes are EC-collapsed outside the kernel (the collapse and the
    Horner weights commute: everything is lane-elementwise)."""
    from jax.experimental import pallas as pl

    c = pl.program_id(0)

    def _jp(xb, yb, zb, infb):
        return JP(FE([xb[j:j + 1, :] for j in range(LIMBS)], MASK16),
                  FE([yb[j:j + 1, :] for j in range(LIMBS)], MASK16),
                  FE([zb[j:j + 1, :] for j in range(LIMBS)], MASK16),
                  infb)

    def fold_window(i, acc):
        wloc = chunk - 1 - i
        # stage this window's accumulator into scratch rows
        # (0-15 x, 16-31 y, 32-47 z, 48 inf)
        s_ref[pl.dslice(0, LIMBS), :] = \
            x_ref[pl.dslice(wloc * LIMBS, LIMBS), :]
        s_ref[pl.dslice(LIMBS, LIMBS), :] = \
            y_ref[pl.dslice(wloc * LIMBS, LIMBS), :]
        s_ref[pl.dslice(2 * LIMBS, LIMBS), :] = \
            z_ref[pl.dslice(wloc * LIMBS, LIMBS), :]
        s_ref[pl.dslice(3 * LIMBS, 1), :] = \
            inf_ref[pl.dslice(0, 1), pl.dslice(wloc * tb, tb)]
        w = tb
        while w > 128:
            h = w // 2

            def part(off):
                return _jp(
                    s_ref[pl.dslice(0, LIMBS), pl.dslice(off, h)],
                    s_ref[pl.dslice(LIMBS, LIMBS), pl.dslice(off, h)],
                    s_ref[pl.dslice(2 * LIMBS, LIMBS),
                          pl.dslice(off, h)],
                    s_ref[pl.dslice(3 * LIMBS, 1), pl.dslice(off, h)])

            out = jp_add(part(0), part(h))
            oxw = fe_weak(out.x)
            oyw = fe_weak(out.y)
            ozw = fe_weak(out.z)
            for j in range(LIMBS):
                s_ref[pl.dslice(j, 1), pl.dslice(0, h)] = oxw.l[j]
                s_ref[pl.dslice(LIMBS + j, 1), pl.dslice(0, h)] = \
                    oyw.l[j]
                s_ref[pl.dslice(2 * LIMBS + j, 1), pl.dslice(0, h)] = \
                    ozw.l[j]
            s_ref[pl.dslice(3 * LIMBS, 1), pl.dslice(0, h)] = out.inf
            w = h
        cur = _jp(s_ref[pl.dslice(0, LIMBS), pl.dslice(0, 128)],
                  s_ref[pl.dslice(LIMBS, LIMBS), pl.dslice(0, 128)],
                  s_ref[pl.dslice(2 * LIMBS, LIMBS), pl.dslice(0, 128)],
                  s_ref[pl.dslice(3 * LIMBS, 1), pl.dslice(0, 128)])
        # acc = 16*acc + S_w (lane-elementwise; collapse later)
        accp = JP(FE(list(acc[0:16]), MASK16),
                  FE(list(acc[16:32]), MASK16),
                  FE(list(acc[32:48]), MASK16), acc[48])
        for _ in range(4):
            accp = jp_double(accp)
        accp = jp_add(accp, cur)
        return (*fe_weak(accp.x).l, *fe_weak(accp.y).l,
                *fe_weak(accp.z).l, accp.inf)

    @pl.when(c == 0)
    def _init():
        # accumulator := infinity (x=0, y=1, z=1, inf=1)
        zeros = jnp.zeros((1, 128), jnp.uint32)
        ones = zeros + 1
        for j in range(LIMBS):
            ox_ref[pl.dslice(j, 1), :] = zeros
            oy_ref[pl.dslice(j, 1), :] = ones if j == 0 else zeros
            oz_ref[pl.dslice(j, 1), :] = ones if j == 0 else zeros
        oinf_ref[pl.dslice(0, 1), :] = ones

    acc0 = (*[ox_ref[pl.dslice(j, 1), :] for j in range(LIMBS)],
            *[oy_ref[pl.dslice(j, 1), :] for j in range(LIMBS)],
            *[oz_ref[pl.dslice(j, 1), :] for j in range(LIMBS)],
            oinf_ref[pl.dslice(0, 1), :])
    out = jax.lax.fori_loop(0, chunk, fold_window, acc0)
    for j in range(LIMBS):
        ox_ref[pl.dslice(j, 1), :] = out[j]
        oy_ref[pl.dslice(j, 1), :] = out[16 + j]
        oz_ref[pl.dslice(j, 1), :] = out[32 + j]
    oinf_ref[pl.dslice(0, 1), :] = out[48]


def _collapse128(x, y, z, inf):
    """EC-sum the 128 accumulator lanes -> 1 (7 halving levels through
    the standalone add kernel; rolls are XLA-side here, where they are
    cheap lane rotations)."""
    from .pallas_group import gej_add_tpu

    idx = jnp.arange(128)
    cur = (x, y, z, inf)
    w = 128
    while w > 1:
        off = w // 2
        b = (jnp.roll(cur[0], -off, axis=-1),
             jnp.roll(cur[1], -off, axis=-1),
             jnp.roll(cur[2], -off, axis=-1),
             jnp.where(idx + off < w, jnp.roll(cur[3], -off),
                       jnp.uint32(1)))
        cur = gej_add_tpu(cur, b, tb=256)
        w = off
    return cur[0][:, 0], cur[1][:, 0], cur[2][:, 0], cur[3][0]


@lru_cache(maxsize=4)
def _finish_call(tb: int, nwin: int, chunk: int):
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunk = nwin // chunk

    @jax.jit
    def run(ox, oy, oz, oinf):
        spec16 = pl.BlockSpec((chunk * LIMBS, tb),
                              lambda c: (nchunk - 1 - c, 0),
                              memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((LIMBS, 128), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_finish_kernel, tb=tb, chunk=chunk, nchunk=nchunk),
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, 128), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, 128), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, 128), jnp.uint32),
                jax.ShapeDtypeStruct((1, 128), jnp.uint32),
            ),
            grid=(nchunk,),
            in_specs=[spec16, spec16, spec16,
                      pl.BlockSpec((1, chunk * tb),
                                   lambda c: (0, nchunk - 1 - c),
                                   memory_space=pltpu.VMEM)],
            out_specs=(ospec, ospec, ospec,
                       pl.BlockSpec((1, 128), lambda c: (0, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((3 * LIMBS + 1, tb),
                                       jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ox, oy, oz, oinf.reshape(1, nwin * tb))

    return run


def _digits_u4(ks_v):
    """Canonical [N, 16] limbs -> [64, N] unsigned 4-bit window digits
    (LSB-first rows); each digit sits inside one 16-bit limb."""
    rows = []
    for w in range(NWIN):
        limb, sh = divmod(4 * w, 16)
        rows.append((ks_v[:, limb] >> sh) & 0xF)
    return jnp.stack(rows, axis=0)


def msm_windowed_tpu(ks, pts, nbits: int = 256, tb: int | None = None):
    """R = sum_i k_i * P_i on TPU; ks: LB [N, 16] canonical, pts:
    group.GE [N].  ``nbits`` bounds the scalars (batch-verify's z_i are
    128-bit: halves the window sweep).  Returns a 0-d group.GEJ."""
    from . import field as F
    from . import group as G
    from .limb import LB

    N = ks.v.shape[0]
    if tb is None:
        tb = min(auto_tb(max(N, 512)), 2048)
    npad = -(-N // tb) * tb
    nwin = -(-nbits // 4)

    x = jnp.swapaxes(F.FP.norm_if_needed(pts.x).v, 0, 1)
    y = jnp.swapaxes(F.FP.norm_if_needed(pts.y).v, 0, 1)
    pinf = pts.inf.astype(jnp.uint32)
    digs = _digits_u4(ks.v)[:nwin]
    if npad != N:
        x = jnp.pad(x, [(0, 0), (0, npad - N)])
        y = jnp.pad(y, [(0, 0), (0, npad - N)])
        pinf = jnp.pad(pinf, [(0, npad - N)], constant_values=1)
        digs = jnp.pad(digs, [(0, 0), (0, npad - N)])

    tab = _table_call(tb)(x, y, pinf[None, :])
    ox, oy, oz, oinf = _winreduce_call(tb, npad // tb, nwin)(
        digs, tab, pinf[None, :])
    chunk = 8 if nwin % 8 == 0 else 4
    fx, fy, fz, finf = _finish_call(tb, nwin, chunk)(ox, oy, oz, oinf)
    cx, cy, cz, cinf = _collapse128(fx, fy, fz, finf[0])
    return G.GEJ(LB(cx, MASK16), LB(cy, MASK16), LB(cz, MASK16),
                 cinf != 0)
