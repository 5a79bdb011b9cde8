"""Pallas TPU kernel for the grid-Potts color-phase update.

One phase of the red/black SRMP sweep (receive incident potts marginals,
send omega-weighted shares back — models/grid_potts.py semantics) fused
into a single VMEM-resident kernel: ~160 MB of HBM traffic per phase
(read + write of the five state arrays) instead of the XLA version's
materialized marginal/pad intermediates.

Layout contract (padded "mask form"):
  - all five state arrays are [L, Hp, Wp], f32;
  - real cells live at rows [P, P+H), cols [1, 1+W); everything else is
    inert (zeros, masks zero) — Wp is lane-aligned, Hp a multiple of the
    row tile TH;
  - h-edge (r,c)-(r,c+1) lives at (r, c) of hm1/hm2/hc for c in [1, W);
    v-edge (r,c)-(r+1,c) at (r, c) of vm1/vm2/vc for r in [P, P+H-1);
  - masks (cell/hedge/vedge/parity/deg) are recomputed in-kernel from
    iota, so only the seven data arrays move through HBM.

Each grid step owns TH output rows; it DMAs TH+3 input rows (one halo row
above, two below — the send into vm2[r] needs the post-receive cost of row
r+1) from HBM with clamped offsets, computes the update entirely in VMEM,
and writes the masked center rows.  Wrap-around garbage from the local
shifts is always multiplied by a zero mask (inert rows/cols), and every
output is re-masked so inert storage stays exactly zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, k, axis):
    """jnp.roll semantics (out[i] = x[i-k]); pltpu.roll wants k >= 0."""
    n = x.shape[axis]
    return pltpu.roll(x, k % n, axis=axis)


def _shift_rows(x, k):
    """out[r] = x[r-k] along axis -2 (wrap; wrapped lanes must be masked)."""
    return _roll(x, k, x.ndim - 2)


def _shift_cols(x, k):
    return _roll(x, k, x.ndim - 1)


def _min2(v):
    """(min, min-except) over axis 0 of [L, R, C]; tie-safe, argmin-free:
    if the min occurs twice, every lane's except-min is the min itself."""
    m = jnp.min(v, axis=0, keepdims=True)
    ismin = v == m
    cnt = jnp.sum(ismin.astype(v.dtype), axis=0, keepdims=True)
    big = jnp.asarray(3e38, v.dtype)
    s = jnp.min(jnp.where(ismin, big, v), axis=0, keepdims=True)
    s = jnp.where(cnt > 1, m, s)
    return m, jnp.where(ismin, s, m)


def _marg(own, other, diff):
    """Potts marginal toward `own`'s side (factors/potts.py.marginal)."""
    if own.shape[0] == 1:
        return own + other
    _, me = _min2(other)
    return own + jnp.minimum(other, me + diff[None])


def _phase_kernel(params_ref,  # SMEM int32 [3]: recv_color, send_color, leave_x10
                  u_hbm, hm1_hbm, hm2_hbm, vm1_hbm, vm2_hbm, hc_hbm, vc_hbm,
                  u_out, hm1_out, hm2_out, vm1_out, vm2_out,
                  u_s, hm1_s, hm2_s, vm1_s, vm2_s, hc_s, vc_s, sems,
                  *, L, Hp, Wp, H, W, P, TH):
    i = pl.program_id(0)
    start = i * TH
    top = jnp.clip(start - 1, 0, Hp - (TH + 3))
    c0 = start - top

    copies = []
    for hbm, vmem in ((u_hbm, u_s), (hm1_hbm, hm1_s), (hm2_hbm, hm2_s),
                      (vm1_hbm, vm1_s), (vm2_hbm, vm2_s)):
        copies.append(pltpu.make_async_copy(
            hbm.at[:, pl.ds(top, TH + 3), :], vmem, sems.at[len(copies)]))
    for hbm, vmem in ((hc_hbm, hc_s), (vc_hbm, vc_s)):
        # 2-D HBM->VMEM DMA with dynamic offsets hangs on this stack, so
        # hc/vc travel with a leading singleton dim
        copies.append(pltpu.make_async_copy(
            hbm.at[:, pl.ds(top, TH + 3), :], vmem, sems.at[len(copies)]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    f32 = jnp.float32
    R = TH + 3
    rows = top + jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    # masks as f32 products (Mosaic dislikes i1 vector selects)
    in_rows = (rows >= P).astype(f32) * (rows < P + H).astype(f32)
    in_cols = (cols >= 1).astype(f32) * (cols < 1 + W).astype(f32)
    cellf = in_rows * in_cols
    hedge = cellf * (cols < W).astype(f32)
    vedge = cellf * (rows < P + H - 1).astype(f32)
    parity = ((rows - P + cols - 1) % 2).astype(f32)  # 0 for black cells
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)

    recv_color = params_ref[0]
    send_color = params_ref[1]
    leave = params_ref[2].astype(f32) / 10.0

    def color_mask(code):
        return jnp.where(code == 1, black, jnp.where(code == 2, red, 0.0))

    recvm = color_mask(recv_color)
    sendm = color_mask(send_color)
    omega = sendm / jnp.maximum(deg + leave, 1.0)

    u = u_s[...]
    hm1 = hm1_s[...]
    hm2 = hm2_s[...]
    vm1 = vm1_s[...]
    vm2 = vm2_s[...]
    hc = hc_s[0]
    vc = vc_s[0]

    e1 = _marg(hm1, hm2, hc)
    e2 = _marg(hm2, hm1, hc)
    v1 = _marg(vm1, vm2, vc)
    v2 = _marg(vm2, vm1, vc)

    mh1 = recvm * hedge
    mh2 = _shift_cols(recvm, -1) * hedge
    mv1 = recvm * vedge
    mv2 = _shift_rows(recvm, -1) * vedge

    uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
            + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
    d = uu * omega[None]
    resid = 1.0 - omega * deg

    def center(x):
        # c0 in {0..3} (0 at the top block, up to 3 at the bottom block);
        # Mosaic has no dynamic_slice on values, so blend static windows
        out = jnp.where(c0 == 0, x[:, 0:TH], jnp.zeros_like(x[:, 0:TH]))
        out = jnp.where(c0 == 1, x[:, 1:TH + 1], out)
        out = jnp.where(c0 == 2, x[:, 2:TH + 2], out)
        return jnp.where(c0 == 3, x[:, 3:TH + 3], out)

    u_out[...] = center(uu * resid[None] * cellf[None])
    hm1_out[...] = center((hm1 - e1 * mh1[None] + d) * hedge[None])
    hm2_out[...] = center((hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * hedge[None])
    vm1_out[...] = center((vm1 - v1 * mv1[None] + d) * vedge[None])
    vm2_out[...] = center((vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * vedge[None])


def _phase_kernel_v2(u_m, u_c, u_p, hm1_m, hm1_c, hm1_p, hm2_m, hm2_c, hm2_p,
                     vm1_m, vm1_c, vm1_p, vm2_m, vm2_c, vm2_p,
                     hc_m, hc_c, hc_p, vc_m, vc_c, vc_p,
                     u_out, hm1_out, hm2_out, vm1_out, vm2_out,
                     *, L, Hp, Wp, H, W, P, TH,
                     recv_color, send_color, leave):
    """Fused color-phase update, halo via neighbor-block inputs.

    The manual HBM->VMEM DMA with dynamic offsets of the v1 kernel hangs on
    the axon/TPU-tunnel stack (artifact: bench/pallas_dma_hang.md), so the
    halo rows come in as three pipelined blocked inputs per array (prev /
    center / next row block, index maps clamped at the edges).  Rows
    start-1 .. start+TH+2 are assembled in VMEM with static slices; masks
    are computed from the *logical* row index so clamped-block garbage and
    wrap-around rows always multiply a zero mask."""
    i = pl.program_id(0)
    start = i * TH

    def halo(m, c, p):
        # m: 8-row block ending at start-1; p: 8-row block from start+TH
        return jnp.concatenate([m[:, -1:, :], c[...], p[:, :2, :]], axis=1)

    f32 = jnp.float32
    R = TH + 3
    rows = (start - 1) + jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    in_rows = (rows >= P).astype(f32) * (rows < P + H).astype(f32)
    in_cols = (cols >= 1).astype(f32) * (cols < 1 + W).astype(f32)
    cellf = in_rows * in_cols
    hedge = cellf * (cols < W).astype(f32)
    vedge = cellf * (rows < P + H - 1).astype(f32)
    parity = ((rows - P + cols - 1) % 2).astype(f32)  # 0 for black cells
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)

    def color_mask(code):
        if code == 1:
            return black
        if code == 2:
            return red
        return jnp.zeros_like(black)

    recvm = color_mask(recv_color)
    sendm = color_mask(send_color)
    omega = sendm / jnp.maximum(deg + leave, 1.0)

    u = halo(u_m, u_c, u_p)
    hm1 = halo(hm1_m, hm1_c, hm1_p)
    hm2 = halo(hm2_m, hm2_c, hm2_p)
    vm1 = halo(vm1_m, vm1_c, vm1_p)
    vm2 = halo(vm2_m, vm2_c, vm2_p)
    hc = jnp.concatenate([hc_m[-1:, :], hc_c[...], hc_p[:2, :]], axis=0)
    vc = jnp.concatenate([vc_m[-1:, :], vc_c[...], vc_p[:2, :]], axis=0)

    e1 = _marg(hm1, hm2, hc)
    e2 = _marg(hm2, hm1, hc)
    v1 = _marg(vm1, vm2, vc)
    v2 = _marg(vm2, vm1, vc)

    mh1 = recvm * hedge
    mh2 = _shift_cols(recvm, -1) * hedge
    mv1 = recvm * vedge
    mv2 = _shift_rows(recvm, -1) * vedge

    uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
            + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
    d = uu * omega[None]
    resid = 1.0 - omega * deg

    def center(x):
        return x[:, 1:TH + 1]

    u_out[...] = center(uu * resid[None] * cellf[None])
    hm1_out[...] = center((hm1 - e1 * mh1[None] + d) * hedge[None])
    hm2_out[...] = center((hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * hedge[None])
    vm1_out[...] = center((vm1 - v1 * mv1[None] + d) * vedge[None])
    vm2_out[...] = center((vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * vedge[None])


@functools.partial(jax.jit,
                   static_argnames=("geom", "phase_params", "interpret"))
def phase_update_v2(state, hc, vc, *, geom, phase_params, interpret=False):
    """One color-phase update without manual DMA (pipelined halo blocks).

    phase_params: static (recv_color, send_color, leave) with color codes
    0=none, 1=black, 2=red; omega = send_mask / (deg + leave).
    state: dict u/hm1/hm2/vm1/vm2 of [L, Hp, Wp] f32 in mask form.
    geom: (L, Hp, Wp, H, W, P, TH).
    """
    L, Hp, Wp, H, W, P, TH = geom
    assert Hp % TH == 0 and TH % 8 == 0, "sublane tiling needs 8-row blocks"
    recv_color, send_color, leave = phase_params
    nblk = Hp // TH
    nb8 = TH // 8
    f32 = jnp.float32
    kernel = functools.partial(
        _phase_kernel_v2, L=L, Hp=Hp, Wp=Wp, H=H, W=W, P=P, TH=TH,
        recv_color=recv_color, send_color=send_color, leave=leave)

    # halo blocks are as small as TPU sublane tiling allows (8 rows): the
    # 8-row block ending at start-1 (its last row is the halo row above) and
    # the 8-row block at start+TH (its first two rows are the halo below);
    # edge clamps feed garbage rows that the logical-row masks zero out.
    def prev_map(i):
        return (0, jnp.maximum(i * nb8 - 1, 0), 0)

    def cent_map(i):
        return (0, i, 0)

    def next_map(i):
        return (0, jnp.minimum((i + 1) * nb8, Hp // 8 - 1), 0)

    def spec3(lead):
        shapes = ((lead, 8, Wp), (lead, TH, Wp), (lead, 8, Wp)) if lead \
            else ((8, Wp), (TH, Wp), (8, Wp))
        maps = (prev_map, cent_map, next_map)
        if lead:
            return [pl.BlockSpec(sh, m) for sh, m in zip(shapes, maps)]
        return [pl.BlockSpec(sh, lambda i, m=m: m(i)[1:])
                for sh, m in zip(shapes, maps)]

    # each array contributes (prev, cent, next) pipelined blocks
    in_specs = (spec3(L) + spec3(L) + spec3(L) + spec3(L) + spec3(L)
                + spec3(0) + spec3(0))
    out_sds = [jax.ShapeDtypeStruct((L, Hp, Wp), f32)] * 5
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((L, TH, Wp), cent_map)] * 5,
        out_shape=out_sds,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(x for arr in (state["u"], state["hm1"], state["hm2"],
                      state["vm1"], state["vm2"]) for x in (arr, arr, arr)),
      hc, hc, hc, vc, vc, vc)
    return {"u": outs[0], "hm1": outs[1], "hm2": outs[2],
            "vm1": outs[3], "vm2": outs[4]}


def _round_kernel_v2(u_m, u_c, u_p, hm1_m, hm1_c, hm1_p, hm2_m, hm2_c, hm2_p,
                     vm1_m, vm1_c, vm1_p, vm2_m, vm2_c, vm2_p,
                     hc_m, hc_c, hc_p, vc_m, vc_c, vc_p,
                     u_out, hm1_out, hm2_out, vm1_out, vm2_out,
                     *, L, Hp, Wp, H, W, P, TH, n_rounds=1):
    """``n_rounds`` FULL anisotropic rounds (red recv+send, then black
    recv+send, repeated) time-tiled into a single kernel pass.

    Each fused color phase would stream all five state arrays through HBM;
    fusing 2*n_rounds phases divides the per-iteration traffic by that
    factor.  Phase k must be valid one stencil ring beyond phase k+1: with
    p = 2*n_rounds phases the kernel needs rows start-p .. start+TH+2p-1
    (one above + two below per phase).  Up to n_rounds=2 (p=4: 4 above,
    8 below) these are still covered by the same single prev/next 8-row
    neighbor blocks, so the read amplification stays (TH+16)/TH while the
    bytes per ITERATION drop 2x per fused round.  Wrap/clamp garbage
    multiplies zero logical-row masks exactly as in _phase_kernel_v2."""
    i = pl.program_id(0)
    start = i * TH
    np_ = 2 * n_rounds
    assert np_ <= 4, "halo slabs cover at most 4 phases (8 rows below)"

    def halo(m, c, p):
        # rows start-np_ .. start+TH+2*np_-1
        return jnp.concatenate([m[:, -np_:, :], c[...], p[:, :2 * np_, :]],
                               axis=1)

    f32 = jnp.float32
    R = TH + 3 * np_
    rows = (start - np_) + jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    in_rows = (rows >= P).astype(f32) * (rows < P + H).astype(f32)
    in_cols = (cols >= 1).astype(f32) * (cols < 1 + W).astype(f32)
    cellf = in_rows * in_cols
    hedge = cellf * (cols < W).astype(f32)
    vedge = cellf * (rows < P + H - 1).astype(f32)
    parity = ((rows - P + cols - 1) % 2).astype(f32)  # 0 for black cells
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)

    u = halo(u_m, u_c, u_p)
    hm1 = halo(hm1_m, hm1_c, hm1_p)
    hm2 = halo(hm2_m, hm2_c, hm2_p)
    vm1 = halo(vm1_m, vm1_c, vm1_p)
    vm2 = halo(vm2_m, vm2_c, vm2_p)
    hc = jnp.concatenate([hc_m[-np_:, :], hc_c[...], hc_p[:2 * np_, :]],
                         axis=0)
    vc = jnp.concatenate([vc_m[-np_:, :], vc_c[...], vc_p[:2 * np_, :]],
                         axis=0)

    def phase(u, hm1, hm2, vm1, vm2, colorm):
        recvm = colorm
        omega = colorm / jnp.maximum(deg, 1.0)
        e1 = _marg(hm1, hm2, hc)
        e2 = _marg(hm2, hm1, hc)
        v1 = _marg(vm1, vm2, vc)
        v2 = _marg(vm2, vm1, vc)
        mh1 = recvm * hedge
        mh2 = _shift_cols(recvm, -1) * hedge
        mv1 = recvm * vedge
        mv2 = _shift_rows(recvm, -1) * vedge
        uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
                + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
        d = uu * omega[None]
        resid = 1.0 - omega * deg
        return (uu * resid[None] * cellf[None],
                (hm1 - e1 * mh1[None] + d) * hedge[None],
                (hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * hedge[None],
                (vm1 - v1 * mv1[None] + d) * vedge[None],
                (vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * vedge[None])

    b = (u, hm1, hm2, vm1, vm2)
    for _ in range(n_rounds):
        b = phase(*phase(*b, red), black)

    def center(x):
        return x[:, np_:TH + np_]

    u_out[...] = center(b[0])
    hm1_out[...] = center(b[1])
    hm2_out[...] = center(b[2])
    vm1_out[...] = center(b[3])
    vm2_out[...] = center(b[4])


@functools.partial(jax.jit, static_argnames=("geom", "n_rounds", "interpret"))
def round_update_v2(state, hc, vc, *, geom, n_rounds=1, interpret=False):
    """``n_rounds`` full anisotropic rounds (red phase then black phase)
    fused into a single Pallas pass — same coordinate updates as the
    sequential ``phase_update_v2(..., (2,2,0)) then (..., (1,1,0))``
    rounds with 1/(2*n_rounds) of the HBM traffic per iteration
    (n_rounds <= 2).  Layout/geometry contract identical to
    phase_update_v2."""
    L, Hp, Wp, H, W, P, TH = geom
    assert Hp % TH == 0 and TH % 8 == 0, "sublane tiling needs 8-row blocks"
    nblk = Hp // TH
    nb8 = TH // 8
    f32 = jnp.float32
    kernel = functools.partial(
        _round_kernel_v2, L=L, Hp=Hp, Wp=Wp, H=H, W=W, P=P, TH=TH,
        n_rounds=n_rounds)

    def prev_map(i):
        return (0, jnp.maximum(i * nb8 - 1, 0), 0)

    def cent_map(i):
        return (0, i, 0)

    def next_map(i):
        return (0, jnp.minimum((i + 1) * nb8, Hp // 8 - 1), 0)

    def spec3(lead):
        shapes = ((lead, 8, Wp), (lead, TH, Wp), (lead, 8, Wp)) if lead \
            else ((8, Wp), (TH, Wp), (8, Wp))
        maps = (prev_map, cent_map, next_map)
        if lead:
            return [pl.BlockSpec(sh, m) for sh, m in zip(shapes, maps)]
        return [pl.BlockSpec(sh, lambda i, m=m: m(i)[1:])
                for sh, m in zip(shapes, maps)]

    in_specs = (spec3(L) + spec3(L) + spec3(L) + spec3(L) + spec3(L)
                + spec3(0) + spec3(0))
    out_sds = [jax.ShapeDtypeStruct((L, Hp, Wp), f32)] * 5
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((L, TH, Wp), cent_map)] * 5,
        out_shape=out_sds,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(x for arr in (state["u"], state["hm1"], state["hm2"],
                      state["vm1"], state["vm2"]) for x in (arr, arr, arr)),
      hc, hc, hc, vc, vc, vc)
    return {"u": outs[0], "hm1": outs[1], "hm2": outs[2],
            "vm1": outs[3], "vm2": outs[4]}


def _phase_kernel_sharded(row0_ref,
                          u_m, u_c, u_p, u_t, u_b,
                          hm1_m, hm1_c, hm1_p, hm1_t, hm1_b,
                          hm2_m, hm2_c, hm2_p, hm2_t, hm2_b,
                          vm1_m, vm1_c, vm1_p, vm1_t, vm1_b,
                          vm2_m, vm2_c, vm2_p, vm2_t, vm2_b,
                          hc_m, hc_c, hc_p, hc_t, hc_b,
                          vc_m, vc_c, vc_p, vc_t, vc_b,
                          u_out, hm1_out, hm2_out, vm1_out, vm2_out,
                          *, L, Wp, H, W, P, TH, nblk,
                          recv_color, send_color, leave):
    """_phase_kernel_v2 on one shard's row window of the global mask form.

    Two deltas vs the single-chip kernel: (1) masks are anchored at a
    *traced* global row offset (scalar-prefetch ``row0``), because the
    shard's block is a window of the global layout; (2) at the window
    edges the neighbor-block halo rows come from the ``*_t``/``*_b``
    8-row slabs (ppermuted from the adjacent shards by the caller)
    instead of the clamped prev/next blocks.  The slabs have constant
    index maps, so the pipeline fetches them once — read amplification
    stays (TH+16)/TH."""
    i = pl.program_id(0)

    def halo(m, c, p, t, b):
        prev = jnp.where(i == 0, t[:, -1:, :], m[:, -1:, :])
        nxt = jnp.where(i == nblk - 1, b[:, :2, :], p[:, :2, :])
        return jnp.concatenate([prev, c[...], nxt], axis=1)

    f32 = jnp.float32
    R = TH + 3
    rows = (row0_ref[0] + i * TH - 1) + jax.lax.broadcasted_iota(
        jnp.int32, (R, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    in_rows = (rows >= P).astype(f32) * (rows < P + H).astype(f32)
    in_cols = (cols >= 1).astype(f32) * (cols < 1 + W).astype(f32)
    cellf = in_rows * in_cols
    hedge = cellf * (cols < W).astype(f32)
    vedge = cellf * (rows < P + H - 1).astype(f32)
    parity = ((rows - P + cols - 1) % 2).astype(f32)  # 0 for black cells
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)

    def color_mask(code):
        if code == 1:
            return black
        if code == 2:
            return red
        return jnp.zeros_like(black)

    recvm = color_mask(recv_color)
    sendm = color_mask(send_color)
    omega = sendm / jnp.maximum(deg + leave, 1.0)

    u = halo(u_m, u_c, u_p, u_t, u_b)
    hm1 = halo(hm1_m, hm1_c, hm1_p, hm1_t, hm1_b)
    hm2 = halo(hm2_m, hm2_c, hm2_p, hm2_t, hm2_b)
    vm1 = halo(vm1_m, vm1_c, vm1_p, vm1_t, vm1_b)
    vm2 = halo(vm2_m, vm2_c, vm2_p, vm2_t, vm2_b)

    def halo2(m, c, p, t, b):
        prev = jnp.where(i == 0, t[-1:, :], m[-1:, :])
        nxt = jnp.where(i == nblk - 1, b[:2, :], p[:2, :])
        return jnp.concatenate([prev, c[...], nxt], axis=0)

    hc = halo2(hc_m, hc_c, hc_p, hc_t, hc_b)
    vc = halo2(vc_m, vc_c, vc_p, vc_t, vc_b)

    e1 = _marg(hm1, hm2, hc)
    e2 = _marg(hm2, hm1, hc)
    v1 = _marg(vm1, vm2, vc)
    v2 = _marg(vm2, vm1, vc)

    mh1 = recvm * hedge
    mh2 = _shift_cols(recvm, -1) * hedge
    mv1 = recvm * vedge
    mv2 = _shift_rows(recvm, -1) * vedge

    uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
            + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
    d = uu * omega[None]
    resid = 1.0 - omega * deg

    def center(x):
        return x[:, 1:TH + 1]

    u_out[...] = center(uu * resid[None] * cellf[None])
    hm1_out[...] = center((hm1 - e1 * mh1[None] + d) * hedge[None])
    hm2_out[...] = center((hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * hedge[None])
    vm1_out[...] = center((vm1 - v1 * mv1[None] + d) * vedge[None])
    vm2_out[...] = center((vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * vedge[None])


def _round_kernel_sharded(row0_ref,
                          u_m, u_c, u_p, u_t, u_b,
                          hm1_m, hm1_c, hm1_p, hm1_t, hm1_b,
                          hm2_m, hm2_c, hm2_p, hm2_t, hm2_b,
                          vm1_m, vm1_c, vm1_p, vm1_t, vm1_b,
                          vm2_m, vm2_c, vm2_p, vm2_t, vm2_b,
                          hc_m, hc_c, hc_p, hc_t, hc_b,
                          vc_m, vc_c, vc_p, vc_t, vc_b,
                          u_out, hm1_out, hm2_out, vm1_out, vm2_out,
                          *, L, Wp, H, W, P, TH, nblk, n_rounds=1):
    """_round_kernel_v2 (time-tiled rounds) on one shard's window: halo
    rows come from the ppermuted 8-row slabs at the window edges (up to 4
    above / 8 below at n_rounds=2, both within the slabs), masks from the
    ``row0`` scalar.  One slab exchange feeds ALL fused color phases —
    fusing also divides the per-iteration collective count."""
    i = pl.program_id(0)
    np_ = 2 * n_rounds
    assert np_ <= 4, "halo slabs cover at most 4 phases (8 rows below)"

    def halo(m, c, p, t, b):
        prev = jnp.where(i == 0, t[:, -np_:, :], m[:, -np_:, :])
        nxt = jnp.where(i == nblk - 1, b[:, :2 * np_, :], p[:, :2 * np_, :])
        return jnp.concatenate([prev, c[...], nxt], axis=1)

    f32 = jnp.float32
    R = TH + 3 * np_
    rows = (row0_ref[0] + i * TH - np_) + jax.lax.broadcasted_iota(
        jnp.int32, (R, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    in_rows = (rows >= P).astype(f32) * (rows < P + H).astype(f32)
    in_cols = (cols >= 1).astype(f32) * (cols < 1 + W).astype(f32)
    cellf = in_rows * in_cols
    hedge = cellf * (cols < W).astype(f32)
    vedge = cellf * (rows < P + H - 1).astype(f32)
    parity = ((rows - P + cols - 1) % 2).astype(f32)
    black = cellf * (1.0 - parity)
    red = cellf - black
    deg = hedge + _shift_cols(hedge, 1) + vedge + _shift_rows(vedge, 1)

    u = halo(u_m, u_c, u_p, u_t, u_b)
    hm1 = halo(hm1_m, hm1_c, hm1_p, hm1_t, hm1_b)
    hm2 = halo(hm2_m, hm2_c, hm2_p, hm2_t, hm2_b)
    vm1 = halo(vm1_m, vm1_c, vm1_p, vm1_t, vm1_b)
    vm2 = halo(vm2_m, vm2_c, vm2_p, vm2_t, vm2_b)

    def halo2(m, c, p, t, b):
        prev = jnp.where(i == 0, t[-np_:, :], m[-np_:, :])
        nxt = jnp.where(i == nblk - 1, b[:2 * np_, :], p[:2 * np_, :])
        return jnp.concatenate([prev, c[...], nxt], axis=0)

    hc = halo2(hc_m, hc_c, hc_p, hc_t, hc_b)
    vc = halo2(vc_m, vc_c, vc_p, vc_t, vc_b)

    def phase(u, hm1, hm2, vm1, vm2, colorm):
        recvm = colorm
        omega = colorm / jnp.maximum(deg, 1.0)
        e1 = _marg(hm1, hm2, hc)
        e2 = _marg(hm2, hm1, hc)
        v1 = _marg(vm1, vm2, vc)
        v2 = _marg(vm2, vm1, vc)
        mh1 = recvm * hedge
        mh2 = _shift_cols(recvm, -1) * hedge
        mv1 = recvm * vedge
        mv2 = _shift_rows(recvm, -1) * vedge
        uu = (u + e1 * mh1[None] + _shift_cols(e2 * mh2[None], 1)
                + v1 * mv1[None] + _shift_rows(v2 * mv2[None], 1))
        d = uu * omega[None]
        resid = 1.0 - omega * deg
        return (uu * resid[None] * cellf[None],
                (hm1 - e1 * mh1[None] + d) * hedge[None],
                (hm2 - e2 * mh2[None] + _shift_cols(d, -1)) * hedge[None],
                (vm1 - v1 * mv1[None] + d) * vedge[None],
                (vm2 - v2 * mv2[None] + _shift_rows(d, -1)) * vedge[None])

    b = (u, hm1, hm2, vm1, vm2)
    for _ in range(n_rounds):
        b = phase(*phase(*b, red), black)

    def center(x):
        return x[:, np_:TH + np_]

    u_out[...] = center(b[0])
    hm1_out[...] = center(b[1])
    hm2_out[...] = center(b[2])
    vm1_out[...] = center(b[3])
    vm2_out[...] = center(b[4])


@functools.partial(jax.jit, static_argnames=("geom", "n_rounds", "interpret"))
def round_update_sharded(state, halos, hc_loc, vc_loc, cost_halos, row0, *,
                         geom, n_rounds=1, interpret=False):
    """Sharded fused anisotropic round (contract of phase_update_sharded,
    math of round_update_v2): one kernel pass per iteration per shard."""
    L, Hl, Wp, H, W, P, TH = geom
    assert Hl % TH == 0 and TH % 8 == 0, "sublane tiling needs 8-row blocks"
    nblk = Hl // TH
    nb8 = TH // 8
    f32 = jnp.float32
    kernel = functools.partial(
        _round_kernel_sharded, L=L, Wp=Wp, H=H, W=W, P=P, TH=TH, nblk=nblk,
        n_rounds=n_rounds)

    def prev_map(i, p):
        return (0, jnp.maximum(i * nb8 - 1, 0), 0)

    def cent_map(i, p):
        return (0, i, 0)

    def next_map(i, p):
        return (0, jnp.minimum((i + 1) * nb8, Hl // 8 - 1), 0)

    def halo_map(i, p):
        return (0, 0, 0)

    def spec5(lead):
        if lead:
            shapes = ((lead, 8, Wp), (lead, TH, Wp), (lead, 8, Wp),
                      (lead, 8, Wp), (lead, 8, Wp))
            maps = (prev_map, cent_map, next_map, halo_map, halo_map)
            return [pl.BlockSpec(sh, m) for sh, m in zip(shapes, maps)]
        shapes = ((8, Wp), (TH, Wp), (8, Wp), (8, Wp), (8, Wp))
        maps = (prev_map, cent_map, next_map, halo_map, halo_map)
        return [pl.BlockSpec(sh, lambda i, p, m=m: m(i, p)[1:])
                for sh, m in zip(shapes, maps)]

    in_specs = spec5(L) * 5 + spec5(0) * 2
    out_sds = [jax.ShapeDtypeStruct((L, Hl, Wp), f32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((L, TH, Wp), cent_map)] * 5,
    )
    args = []
    for k in ("u", "hm1", "hm2", "vm1", "vm2"):
        t, b = halos[k]
        args += [state[k], state[k], state[k], t, b]
    for loc, k in ((hc_loc, "hc"), (vc_loc, "vc")):
        t, b = cost_halos[k]
        args += [loc, loc, loc, t, b]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_sds,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(row0, *args)
    return {"u": outs[0], "hm1": outs[1], "hm2": outs[2],
            "vm1": outs[3], "vm2": outs[4]}


@functools.partial(jax.jit,
                   static_argnames=("geom", "phase_params", "interpret"))
def phase_update_sharded(state, halos, hc_loc, vc_loc, cost_halos, row0, *,
                         geom, phase_params, interpret=False):
    """One color-phase update on a shard's Hl-row window of the mask form.

    Multi-chip contract (parallel/grid.ShardedGridPotts.run_fast): the
    shard's state block [L, Hl, Wp] stays in the base sharded layout;
    the caller ppermutes the 8 boundary rows of each neighbor into
    ``halos`` = dict of (top8, bot8) [L, 8, Wp] slabs (zeros at the mesh
    edges — those logical rows are inert).  The kernel runs the v2
    neighbor-block scheme over the window's Hl/TH blocks and swaps in
    the slabs at the window edges; slabs have constant index maps, so
    the pipeline fetches them once and read amplification stays
    (TH+16)/TH.  Masks are anchored at the *traced* global row offset
    ``row0`` (int32 [1], = shard_index * Hl in the global mask form).

    ``hc_loc``/``vc_loc``: the shard's [Hl, Wp] cost rows;
    ``cost_halos``: dict hc/vc of static (top8, bot8) cost slabs.
    geom: (L, Hl, Wp, H, W, P, TH).
    """
    L, Hl, Wp, H, W, P, TH = geom
    assert Hl % TH == 0 and TH % 8 == 0, "sublane tiling needs 8-row blocks"
    recv_color, send_color, leave = phase_params
    nblk = Hl // TH
    nb8 = TH // 8
    f32 = jnp.float32
    kernel = functools.partial(
        _phase_kernel_sharded, L=L, Wp=Wp, H=H, W=W, P=P, TH=TH, nblk=nblk,
        recv_color=recv_color, send_color=send_color, leave=leave)

    def prev_map(i, p):
        return (0, jnp.maximum(i * nb8 - 1, 0), 0)

    def cent_map(i, p):
        return (0, i, 0)

    def next_map(i, p):
        return (0, jnp.minimum((i + 1) * nb8, Hl // 8 - 1), 0)

    def halo_map(i, p):
        return (0, 0, 0)

    def spec5(lead):
        if lead:
            shapes = ((lead, 8, Wp), (lead, TH, Wp), (lead, 8, Wp),
                      (lead, 8, Wp), (lead, 8, Wp))
            maps = (prev_map, cent_map, next_map, halo_map, halo_map)
            return [pl.BlockSpec(sh, m) for sh, m in zip(shapes, maps)]
        shapes = ((8, Wp), (TH, Wp), (8, Wp), (8, Wp), (8, Wp))
        maps = (prev_map, cent_map, next_map, halo_map, halo_map)
        return [pl.BlockSpec(sh, lambda i, p, m=m: m(i, p)[1:])
                for sh, m in zip(shapes, maps)]

    in_specs = spec5(L) * 5 + spec5(0) * 2
    out_sds = [jax.ShapeDtypeStruct((L, Hl, Wp), f32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((L, TH, Wp), cent_map)] * 5,
    )
    args = []
    for k in ("u", "hm1", "hm2", "vm1", "vm2"):
        t, b = halos[k]
        args += [state[k], state[k], state[k], t, b]
    for loc, k in ((hc_loc, "hc"), (vc_loc, "vc")):
        t, b = cost_halos[k]
        args += [loc, loc, loc, t, b]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_sds,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(row0, *args)
    return {"u": outs[0], "hm1": outs[1], "hm2": outs[2],
            "vm1": outs[3], "vm2": outs[4]}


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def phase_update(params, state, hc, vc, *, geom, interpret=False):
    """One color-phase update (v1, interpret-mode cross-check ONLY).

    Kept as an independent formulation of the same phase math for the
    interpret-mode equivalence suite (tests/test_pallas_grid.py); NOT a
    hardware path — its dynamic-offset manual DMA hangs on the axon
    runtime (artifact: bench/pallas_dma_hang.md).  Production kernels:
    phase_update_v2 (single chip), phase_update_sharded (multi-chip).

    params: int32 [3] = (recv_color, send_color, leave*10) with color codes
    0=none, 1=black, 2=red; omega = send_mask / (deg + leave).
    state: dict u/hm1/hm2/vm1/vm2 of [L, Hp, Wp] f32 in mask form.
    geom: (L, Hp, Wp, H, W, P, TH).
    """
    L, Hp, Wp, H, W, P, TH = geom
    assert Hp % TH == 0
    f32 = jnp.float32
    kernel = functools.partial(_phase_kernel, L=L, Hp=Hp, Wp=Wp, H=H, W=W,
                               P=P, TH=TH)
    out_sds = [jax.ShapeDtypeStruct((L, Hp, Wp), f32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hp // TH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[pl.BlockSpec((L, TH, Wp), lambda i, p: (0, i, 0),
                                memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[pltpu.VMEM((L, TH + 3, Wp), f32)] * 5
        + [pltpu.VMEM((1, TH + 3, Wp), f32)] * 2
        + [pltpu.SemaphoreType.DMA((7,))],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_sds,
        interpret=interpret,
    )(params, state["u"], state["hm1"], state["hm2"], state["vm1"],
      state["vm2"], hc[None], vc[None])
    return {"u": outs[0], "hm1": outs[1], "hm2": outs[2],
            "vm1": outs[3], "vm2": outs[4]}
