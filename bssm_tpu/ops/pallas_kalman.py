"""Fused Pallas TPU kernel: Kalman filter + fast smoother + log-likelihood.

The Laplace-iteration hot loop (`inference/approx.py`) runs a full Kalman
forward pass and a backward mean pass per iteration, per MCMC step, per
chain.  As an XLA `lax.scan` each of the ~2n tiny recursion steps costs a
loop-iteration dispatch on (chains, m)-sized data — latency-bound, the MXU
and VPU idle.  This kernel re-designs the recursion TPU-first
("chains-in-lanes"):

- the *chains* axis maps onto the 128 VPU lanes, so every recursion step is
  a handful of fully-vectorised (1, 128) ops;
- the state dimension m (<= 4 in every reference benchmark config:
  `/root/reference/src/model_bsm_lg.cpp`, bsm level+slope m=2) is unrolled
  at trace time into scalar-per-chain register lists — no tiny matmuls, no
  sublane padding waste;
- both the forward filter and the backward smoothing pass run inside ONE
  kernel invocation, with the per-time stats (v, F, K, a, P) staged in VMEM
  scratch (~1.5 MB at n=153, m=2) — zero HBM round-trips between passes;
- missing observations follow the branch-free mask discipline of
  `ops/kalman.py` (NaN in y => no update), bit-identical semantics.

Numerics match `ops/kalman.fast_smoother_ll` (same Joseph-form update, same
ZERO_TOL guards); parity is asserted in tests/test_pallas.py on CPU via
interpret mode.

Reference parity: `/root/reference/src/model_ssm_ulg.cpp:106-138` (filter),
`252-305` (fast smoother); the fusion itself is the TPU re-design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kalman import LOG2PI, ZERO_TOL

LANES = 128
_MAX_M = 4
# VMEM budget guard: scratch rows ~ n * (2 + 3m + mm) * LANES * 4B
_VMEM_LIMIT_BYTES = 10 * 1024 * 1024
# sublane-packing budget: scratch + double-buffered io tiles must fit VMEM
# (~16 MB/core on v5e); leave headroom for the compiler.  Tunable via
# BSSM_VMEM_BUDGET_MB for empirical probing on real hardware.
import os as _os  # noqa: E402
_VMEM_BUDGET = int(_os.environ.get("BSSM_VMEM_BUDGET_MB", "13")) \
    * 1024 * 1024


def _supported(n: int, m: int) -> bool:
    rows = n * (2 + 3 * m + m * m) + 2 * (n + 1) * m
    return m <= _MAX_M and rows * LANES * 4 < _VMEM_LIMIT_BYTES


def _pick_subs(scratch_rows: int, io_rows: int, B: int,
               itemsize: int = 4) -> int:
    """Sublanes-per-block multiplicity: at SUBS=8 every kernel "row" op
    processes a full (8, 128) vreg tile of chains instead of one sublane
    (8x fewer vector instructions per recursion step).  Mosaic requires
    the sublane block dim to be divisible by 8, so the only legal tilings
    are SUBS=8 (3-D refs) and SUBS=1 (the 2-D packed-rows layout); pick 8
    when the batch is big enough and the VMEM footprint (scratch +
    double-buffered io blocks) fits."""
    if B >= 8 * LANES and (scratch_rows + 2 * io_rows) * 8 * LANES \
            * itemsize < _VMEM_BUDGET:
        return 8
    return 1


_FALLBACK_SEEN: set = set()


def _fallback_notice(kind: str, **dims) -> None:
    """One-line, once-per-config notice that a batched call declined the
    fused Pallas kernel and fell back to the XLA scan path (VERDICT r03:
    the silent fallback hid an order-of-magnitude perf tier change).
    Emitted at trace time, so steady-state jit execution costs nothing."""
    key = (kind,) + tuple(sorted(dims.items()))
    if key in _FALLBACK_SEEN:
        return
    _FALLBACK_SEEN.add(key)
    import logging
    logging.getLogger("bssm_tpu").info(
        "fused %s kernel unsupported at %s; using the scan path",
        kind, ", ".join(f"{k}={v}" for k, v in sorted(dims.items())))


def _load_system(m, z_ref, t_ref, rr_ref, a1_ref, p1_ref, c_ref):
    """Unpack the time-invariant system rows into per-element (SUBS, LANES)
    tiles."""
    mm = m * m

    def row(ref, i):
        return ref[i]

    Z = [row(z_ref, i) for i in range(m)]
    T = [[row(t_ref, i * m + j) for j in range(m)] for i in range(m)]
    RR = [[row(rr_ref, i * m + j) for j in range(m)] for i in range(m)]
    Cv = [row(c_ref, i) for i in range(m)]
    a0 = [row(a1_ref, i) for i in range(m)]
    P0 = [row(p1_ref, i) for i in range(mm)]
    return Z, T, RR, Cv, a0, P0


def _recompute_K(m, P, Z, Fs, okf):
    """Backward-pass gain ok * (P Z) / F from the staged (P, Fs, ok)."""
    K = []
    for i in range(m):
        pz = P[i * m] * Z[0]
        for j in range(1, m):
            pz = pz + P[i * m + j] * Z[j]
        K.append(okf * pz / Fs)
    return K


def _forward_filter(n, m, y_ref, h2_ref, d_ref, Z, T, RR, Cv, a0, P0,
                    v_s, f_s, ok_s, at_s, pt_s, get_obs=None,
                    t_range=None, carry_in=None):
    """Masked Joseph-form Kalman forward pass, staging per-time stats into
    VMEM scratch.  Returns (a_n, P_n, ll) (SUBS, LANES) tiles; shared by the
    fast-smoother, loglik, RTS, and Laplace-step kernels.

    The gain K is NOT staged: the backward passes recompute it as
    ok * (P Z) / F from the staged (P, F, ok) — m*m fused multiplies per
    step buy n*m VMEM scratch rows, which is what lets the hot kernels
    run sublane-packed at realistic series lengths.

    ``get_obs(t) -> (y, h2, d)`` overrides reading the observation rows —
    the Laplace-step kernel computes the pseudo-observations on the fly
    from the signal mode instead of staging them through HBM.

    ``t_range=(t_lo, t_hi)`` with ``carry_in`` runs only that slice of the
    recursion and returns the carry WITHOUT the final at/Pt staging — the
    streamed-io RTS kernel drives the pass chunk by chunk.  The final
    (t_hi == n) slice stages a_n/P_n as usual."""
    dt = at_s.dtype
    mm = m * m
    ll0 = jnp.zeros_like(a0[0])

    def fwd(t, carry):
        a, P, ll = carry
        if get_obs is None:
            y = y_ref[t]
            h2 = h2_ref[t]
            d = d_ref[t]
        else:
            y, h2, d = get_obs(t)
        # sanitize NaN pseudo-variances at missing y (see ops/kalman._update)
        h2 = jnp.where(jnp.isfinite(h2), h2, 1.0)
        # F = Z' P Z + h2
        F = h2
        for i in range(m):
            for j in range(m):
                F = F + Z[i] * P[i * m + j] * Z[j]
        ok = jnp.isfinite(y) & (F > ZERO_TOL)
        okf = ok.astype(dt)
        Fs = jnp.where(ok, F, 1.0)
        za = jnp.zeros_like(F)
        for i in range(m):
            za = za + Z[i] * a[i]
        v = jnp.where(ok, y - d - za, 0.0)
        # K = P Z / F
        K = []
        for i in range(m):
            pz = jnp.zeros_like(F)
            for j in range(m):
                pz = pz + P[i * m + j] * Z[j]
            K.append(jnp.where(ok, pz / Fs, 0.0))
        att = [a[i] + K[i] * v for i in range(m)]
        a_next = [Cv[i] for i in range(m)]
        for i in range(m):
            for j in range(m):
                a_next[i] = a_next[i] + T[i][j] * att[j]
        # Joseph-form update: P_upd = (I-KZ') P (I-KZ')' + h2 K K'
        # B = (I - K Z'); B_ij = delta_ij - K_i Z_j
        BP = [jnp.zeros_like(F) for _ in range(mm)]   # B @ P
        for i in range(m):
            for j in range(m):
                s = P[i * m + j]
                for l in range(m):
                    s = s - K[i] * Z[l] * P[l * m + j]
                BP[i * m + j] = s
        Pu = [jnp.zeros_like(F) for _ in range(mm)]   # BP @ B' + h2 KK'
        for i in range(m):
            for j in range(m):
                s = BP[i * m + j]
                for l in range(m):
                    s = s - BP[i * m + l] * K[j] * Z[l]
                Pu[i * m + j] = s + h2 * K[i] * K[j]
        Ptt = [okf * Pu[ij] + (1.0 - okf) * P[ij] for ij in range(mm)]
        # symmetrise
        Ptt = [0.5 * (Ptt[i * m + j] + Ptt[j * m + i])
               for i in range(m) for j in range(m)]
        # P_next = T Ptt T' + RR
        TP = [jnp.zeros_like(F) for _ in range(mm)]
        for i in range(m):
            for j in range(m):
                s = jnp.zeros_like(F)
                for l in range(m):
                    s = s + T[i][l] * Ptt[l * m + j]
                TP[i * m + j] = s
        P_next = [jnp.zeros_like(F) for _ in range(mm)]
        for i in range(m):
            for j in range(m):
                s = RR[i][j]
                for l in range(m):
                    s = s + TP[i * m + l] * T[j][l]
                P_next[i * m + j] = s
        P_next = [0.5 * (P_next[i * m + j] + P_next[j * m + i])
                  for i in range(m) for j in range(m)]
        ll = ll + okf * (-0.5 * (LOG2PI + jnp.log(Fs) + v * v / Fs))
        # stage stats for the backward pass
        v_s[t] = v
        f_s[t] = Fs
        ok_s[t] = okf
        for i in range(m):
            at_s[t * m + i] = a[i]
        for ij in range(mm):
            pt_s[t * mm + ij] = P[ij]
        return a_next, P_next, ll

    if t_range is not None:
        t_lo, t_hi = t_range
        carry = carry_in if carry_in is not None else (a0, P0, ll0)
        a_n, P_n, ll = jax.lax.fori_loop(t_lo, t_hi, fwd, carry)
        if t_hi == n:
            for i in range(m):
                at_s[n * m + i] = a_n[i]
            for ij in range(mm):
                pt_s[n * mm + ij] = P_n[ij]
        return a_n, P_n, ll

    a_n, P_n, ll = jax.lax.fori_loop(0, n, fwd, (a0, P0, ll0))
    for i in range(m):
        at_s[n * m + i] = a_n[i]
    for ij in range(mm):
        pt_s[n * mm + ij] = P_n[ij]
    return a_n, P_n, ll


def _kernel(n: int, m: int, y_ref, h2_ref, d_ref, z_ref, t_ref, rr_ref,
            a1_ref, p1_ref, c_ref, alpha_ref, ll_ref,
            v_s, f_s, ok_s, at_s, pt_s):
    """One block of SUBS*LANES chains.  All refs are 3D (rows, SUBS, LANES)
    in VMEM, so every per-row op is a full (8, 128) vreg tile.

    Row layouts: y/h2/d (n,); z/c/a1 (m,); t/rr/p1 (m*m,) with row
    i*m+j = element (i, j); outputs alpha ((n+1)*m,), ll (1,); scratch
    v/f/ok (n,), k (n*m,), at ((n+1)*m,), pt ((n+1)*m*m,).
    """
    mm = m * m
    Z, T, RR, Cv, a0, P0 = _load_system(m, z_ref, t_ref, rr_ref, a1_ref,
                                        p1_ref, c_ref)
    a_n, P_n, ll = _forward_filter(n, m, y_ref, h2_ref, d_ref, Z, T, RR, Cv,
                                   a0, P0, v_s, f_s, ok_s, at_s, pt_s)
    ll_ref[0] = ll
    for i in range(m):
        alpha_ref[n * m + i] = a_n[i]

    # backward mean pass: r_{t-1} = ok (Z v/F + L' r_t) + (1-ok) T' r_t,
    # L = T (I - K Z');  alphahat_t = a_t + P_t r_{t-1}   (DK eq. 4.44)
    r0 = [jnp.zeros_like(ll) for _ in range(m)]

    def bwd(i, r):
        t = n - 1 - i
        v = v_s[t]
        F = f_s[t]
        okf = ok_s[t]
        P = [pt_s[t * mm + ij] for ij in range(mm)]
        K = _recompute_K(m, P, Z, F, okf)
        # TK_i = (T K)_i ;  L_ij = T_ij - TK_i Z_j ; need L' r = sum_i L_ij r_i
        TK = []
        for i2 in range(m):
            s = jnp.zeros_like(F)
            for l in range(m):
                s = s + T[i2][l] * K[l]
            TK.append(s)
        Ttr = []        # (T' r)_j
        Ltr = []        # (L' r)_j
        for j in range(m):
            st = jnp.zeros_like(F)
            sl = jnp.zeros_like(F)
            for i2 in range(m):
                st = st + T[i2][j] * r[i2]
                sl = sl + (T[i2][j] - TK[i2] * Z[j]) * r[i2]
            Ttr.append(st)
            Ltr.append(sl)
        r_new = [okf * (Z[j] * (v / F) + Ltr[j]) + (1.0 - okf) * Ttr[j]
                 for j in range(m)]
        for i2 in range(m):
            s = at_s[t * m + i2]
            for j in range(m):
                s = s + P[i2 * m + j] * r_new[j]
            alpha_ref[t * m + i2] = s
        return r_new

    jax.lax.fori_loop(0, n, bwd, r0)


def _ll_kernel(n: int, m: int, y_ref, h2_ref, d_ref, z_ref, t_ref, rr_ref,
               a1_ref, p1_ref, c_ref, ll_ref, v_s, f_s, ok_s, at_s,
               pt_s):
    """Forward-only variant: the Kalman log-likelihood without the backward
    pass — the whole target of linear-Gaussian marginal MCMC
    (`/root/reference/src/model_ssm_ulg.cpp:106-138`)."""
    Z, T, RR, Cv, a0, P0 = _load_system(m, z_ref, t_ref, rr_ref, a1_ref,
                                        p1_ref, c_ref)
    _, _, ll = _forward_filter(n, m, y_ref, h2_ref, d_ref, Z, T, RR, Cv,
                               a0, P0, v_s, f_s, ok_s, at_s, pt_s)
    ll_ref[0] = ll


def _tiles(Cn, subs, dt):
    """Shared tiling helpers for the call wrappers.

    subs == 1: the 2-D (rows, LANES) layout — rows pack 8-per-vreg-tile,
    ops are (1, 128) row vectors (one sublane per instruction).
    subs == 8: 3-D (rows, SUBS, LANES) refs — every row is a full (8, 128)
    tile of chains at (c // LANES, c % LANES); the grid walks sublane
    groups.  (Mosaic only allows sublane block dims divisible by 8.)"""

    if subs == 1:
        def lanes_last(x, rows):
            return jnp.swapaxes(x.reshape(x.shape[0], rows), 0, 1)

        def spec(rows):
            return pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def out_sd(rows):
            return jax.ShapeDtypeStruct((rows, Cn), dt)

        def unpack(x):
            return jnp.swapaxes(x, 0, 1)

        def scratch(rows):
            return pltpu.VMEM((rows, LANES), dt)

        return lanes_last, spec, out_sd, unpack, scratch

    def lanes_last(x, rows):
        return jnp.swapaxes(x.reshape(x.shape[0], rows), 0, 1).reshape(
            rows, Cn // LANES, LANES)

    def spec(rows):
        return pl.BlockSpec((rows, subs, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def out_sd(rows):
        return jax.ShapeDtypeStruct((rows, Cn // LANES, LANES), dt)

    def unpack(x):
        return jnp.swapaxes(x.reshape(x.shape[0], Cn), 0, 1)

    def scratch(rows):
        return pltpu.VMEM((rows, subs, LANES), dt)

    return lanes_last, spec, out_sd, unpack, scratch


@functools.partial(jax.jit, static_argnames=("n", "m", "subs", "interpret"))
def _fused_ll_call(y, h2, d, z, t, rr, a1, p1, c, *, n, m, subs=1,
                   interpret=False):
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    args = (lanes_last(y, n), lanes_last(h2, n), lanes_last(d, n),
            lanes_last(z, m), lanes_last(t, mm), lanes_last(rr, mm),
            lanes_last(a1, m), lanes_last(p1, mm), lanes_last(c, m))
    grid = (Cn // (subs * LANES),)

    in_specs = [spec(n), spec(n), spec(n), spec(m), spec(mm), spec(mm),
                spec(m), spec(mm), spec(m)]
    scratch = [
        scratch_t(n),
        scratch_t(n),
        scratch_t(n),
        scratch_t((n + 1) * m),
        scratch_t((n + 1) * mm),
    ]
    ll = pl.pallas_call(
        functools.partial(_ll_kernel, n, m),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(1),
        out_shape=out_sd(1),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return ll.reshape(Cn)


def _pad_block(arrays, B, subs):
    pad = (-B) % (subs * LANES)
    if not pad:
        return arrays

    def padc(x):
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])

    return [padc(x) for x in arrays]


def _kf_rows(n, m):
    """(scratch_rows, io_rows) of the shared forward-filter footprint
    (v, F, ok, at, Pt staged; K recomputed in the backward pass)."""
    mm = m * m
    scratch = 3 * n + (n + 1) * m + (n + 1) * mm
    io = 3 * n + 3 * m + 3 * mm + 1
    return scratch, io


def fused_log_likelihood_batched(spec, axis_size, interpret=False):
    """Batched Kalman log-likelihood via the forward-only kernel, or None."""
    prep = _batched_inputs(spec, axis_size)
    if prep is None:
        return None
    y, h2, d, z, t, rr, a1, p1, c, n, m = prep
    B = y.shape[0]
    subs = _pick_subs(*_kf_rows(n, m), B, itemsize=y.dtype.itemsize)
    y, h2, d, z, t, rr, a1, p1, c = _pad_block(
        (y, h2, d, z, t, rr, a1, p1, c), B, subs)
    ll = _fused_ll_call(y, h2, d, z, t, rr, a1, p1, c, n=n, m=m, subs=subs,
                        interpret=interpret)
    ll = ll[:B]
    degenerate = (jnp.sum(h2[:B], axis=-1)
                  + jnp.sum(jnp.abs(rr[:B]), axis=(-1, -2))) < ZERO_TOL
    return jnp.where(degenerate, -jnp.inf, ll)


@jax.custom_batching.custom_vmap
def log_likelihood_auto(spec):
    """`ops.kalman.log_likelihood` with fused-kernel batching — the target
    density of vmapped linear-Gaussian RAM chains."""
    from . import kalman
    return kalman.log_likelihood(spec)


@log_likelihood_auto.def_vmap
def _log_likelihood_vmap(axis_size, in_batched, spec):
    from ..core import config as _config
    from . import kalman
    (spec_batched,) = in_batched
    if _config.use_fused():
        out = fused_log_likelihood_batched(spec, axis_size,
                                           interpret=_interpret_mode())
        if out is not None:
            return out, True
        _fallback_notice("loglik", n=spec.y.shape[-1], m=spec.a1.shape[-1])
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None, spec_batched)
    return jax.vmap(kalman.log_likelihood, in_axes=(axes,))(spec), True


@functools.partial(jax.jit, static_argnames=("n", "m", "subs", "interpret"))
def _fused_call(y, h2, d, z, t, rr, a1, p1, c, *, n, m, subs=1,
                interpret=False):
    """y/h2/d: (C, n); z/c/a1: (C, m); t/rr/p1: (C, m, m).
    C % (subs*LANES) == 0.  Returns alpha (C, n+1, m), ll (C,)."""
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    args = (lanes_last(y, n), lanes_last(h2, n), lanes_last(d, n),
            lanes_last(z, m), lanes_last(t, mm), lanes_last(rr, mm),
            lanes_last(a1, m), lanes_last(p1, mm), lanes_last(c, m))

    grid = (Cn // (subs * LANES),)

    in_specs = [spec(n), spec(n), spec(n), spec(m), spec(mm), spec(mm),
                spec(m), spec(mm), spec(m)]
    out_specs = (spec((n + 1) * m), spec(1))
    out_shape = (out_sd((n + 1) * m), out_sd(1))
    scratch = [
        scratch_t(n),             # v
        scratch_t(n),             # F
        scratch_t(n),             # ok
        scratch_t((n + 1) * m),   # at
        scratch_t((n + 1) * mm),  # Pt
    ]
    alpha_r, ll_r = pl.pallas_call(
        functools.partial(_kernel, n, m),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    alpha = unpack(alpha_r).reshape(Cn, n + 1, m)
    return alpha, ll_r.reshape(Cn)


def _batched_inputs(spec, axis_size):
    """Normalise a batched LGSpec (leading batch axis on some leaves) into
    dense per-chain (C, ...) arrays with static time axes squeezed.
    Returns None if the spec shape is outside the kernel's support."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported(n, m):
        return None
    # time-varying Z/T/R/C unsupported (covers every fixed-form model:
    # bsm/ar1/svm are time-invariant); H/D/y may vary over time
    if spec.Z.shape[-2] != 1 or spec.T.shape[-3] != 1 or \
            spec.R.shape[-3] != 1 or spec.C.shape[-2] != 1:
        return None

    def dense(x, core_shape):
        x = jnp.asarray(x)
        if x.ndim == len(core_shape):           # unbatched leaf
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        return x

    y = dense(spec.y, (n,))
    H = dense(spec.H, (spec.H.shape[-1],))
    if H.shape[-1] == 1:
        H = jnp.broadcast_to(H, (axis_size, n))
    D = dense(spec.D, (spec.D.shape[-1],)).astype(y.dtype)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (axis_size, n))
    Z = dense(spec.Z, (1, m))[:, 0]
    T = dense(spec.T, (1, m, m))[:, 0]
    R = dense(spec.R, spec.R.shape[-3:])[:, 0]
    RR = jnp.einsum('cij,ckj->cik', R, R)
    a1 = dense(spec.a1, (m,))
    P1 = dense(spec.P1, (m, m))
    C = dense(spec.C, (1, m))[:, 0]
    return y, H * H, D, Z, T, RR, a1, P1, C, n, m


def _interpret_mode() -> bool:
    import jax as _jax
    return _jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# fused Laplace iteration step
# ---------------------------------------------------------------------------
# One body of the mode-matching loop (`/root/reference/src/model_ssm_ung.cpp:
# 87-140`): build pseudo-observations from the current signal mode, Kalman
# filter + fast-smooth the approximating model, and emit the new mode and
# mean-squared change — all in one kernel, no (ytilde, Htilde) HBM staging.

_SVM_CODE = 0  # must match core.spec codes
_GAUSSIAN = 5


def _lane_laplace_match(dist, y, u, phi, s):
    """(ytilde, HHtilde) on lane vectors; mirrors
    core.distributions.laplace_match (NaN y propagates to ytilde)."""
    if dist == _SVM:
        ys = jnp.where(jnp.abs(y) < 1e-4, 1e-4, y)
        hh = 2.0 * _lane_safe_exp(s) / jnp.square(ys / phi)
        yt = s + 1.0 - 0.5 * hh
    elif dist == _POISSON:
        hh = 1.0 / (_lane_safe_exp(s) * u)
        yt = y * hh + s - 1.0
    elif dist == _BINOMIAL:
        es = _lane_safe_exp(s)
        hh = jnp.square(1.0 + es) / (u * es)
        yt = y * hh + s - 1.0 - es
    elif dist == _NEGBIN:
        eu = _lane_safe_exp(s) * u
        hh = jnp.square(phi + eu) / (phi * eu * (y + phi))
        yt = s + (phi + eu) * (y - eu) / ((y + phi) * eu)
    elif dist == _GAMMA:
        eu = _lane_safe_exp(s) * u
        hh = eu / (y * phi)
        yt = s - eu / y + 1.0
    else:
        raise ValueError(f"laplace kernel: unsupported family {dist}")
    return yt, hh


def _laplace_step_kernel(n: int, m: int, dist: int,
                         y_ref, u_ref, d_ref, z_ref, t_ref, rr_ref,
                         a1_ref, p1_ref, c_ref, phi_ref, mode_ref,
                         mode_out_ref, ll_ref, diff_ref,
                         v_s, f_s, ok_s, at_s, pt_s):
    """mode -> (new mode, KF loglik at match(mode), mean-squared change)."""
    mm = m * m
    Z, T, RR, Cv, a0, P0 = _load_system(m, z_ref, t_ref, rr_ref, a1_ref,
                                        p1_ref, c_ref)
    phi = phi_ref[0]

    def get_obs(t):
        y = y_ref[t]
        u = u_ref[t]
        s = mode_ref[t]
        yt, hh = _lane_laplace_match(dist, y, u, phi, s)
        hh = jnp.where(jnp.isfinite(hh) & (hh > 0), hh, 1.0)
        yt = jnp.where(jnp.isfinite(y), yt, jnp.nan)
        return yt, hh, d_ref[t]

    a_n, P_n, ll = _forward_filter(n, m, None, None, None, Z, T, RR, Cv,
                                   a0, P0, v_s, f_s, ok_s, at_s, pt_s,
                                   get_obs=get_obs)
    ll_ref[0] = ll

    r0 = [jnp.zeros_like(ll) for _ in range(m)]
    dacc0 = jnp.zeros_like(ll)

    def bwd(i, carry):
        r, dacc = carry
        t = n - 1 - i
        v = v_s[t]
        F = f_s[t]
        okf = ok_s[t]
        P = [pt_s[t * mm + ij] for ij in range(mm)]
        K = _recompute_K(m, P, Z, F, okf)
        TK = []
        for i2 in range(m):
            s = jnp.zeros_like(F)
            for l in range(m):
                s = s + T[i2][l] * K[l]
            TK.append(s)
        Ttr, Ltr = [], []
        for j in range(m):
            st = jnp.zeros_like(F)
            sl = jnp.zeros_like(F)
            for i2 in range(m):
                st = st + T[i2][j] * r[i2]
                sl = sl + (T[i2][j] - TK[i2] * Z[j]) * r[i2]
            Ttr.append(st)
            Ltr.append(sl)
        r_new = [okf * (Z[j] * (v / F) + Ltr[j]) + (1.0 - okf) * Ttr[j]
                 for j in range(m)]
        alpha_t = []
        for i2 in range(m):
            s = at_s[t * m + i2]
            for j in range(m):
                s = s + P[i2 * m + j] * r_new[j]
            alpha_t.append(s)
        if dist == _SVM:
            new_mode = alpha_t[0]
        else:
            new_mode = d_ref[t]
            for i2 in range(m):
                new_mode = new_mode + Z[i2] * alpha_t[i2]
        mode_out_ref[t] = new_mode
        delta = new_mode - mode_ref[t]
        return r_new, dacc + delta * delta

    _, dacc = jax.lax.fori_loop(0, n, bwd, (r0, dacc0))
    diff_ref[0] = dacc / n


@functools.partial(jax.jit, static_argnames=("n", "m", "dist", "subs",
                                             "interpret"))
def _fused_laplace_call(y, u, d, z, t, rr, a1, p1, c, phi, mode, *,
                        n, m, dist, subs=1, interpret=False):
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    args = (lanes_last(y, n), lanes_last(u, n), lanes_last(d, n),
            lanes_last(z, m), lanes_last(t, mm), lanes_last(rr, mm),
            lanes_last(a1, m), lanes_last(p1, mm), lanes_last(c, m),
            lanes_last(phi, 1), lanes_last(mode, n))
    grid = (Cn // (subs * LANES),)

    in_specs = [spec(n), spec(n), spec(n), spec(m), spec(mm), spec(mm),
                spec(m), spec(mm), spec(m), spec(1), spec(n)]
    out_specs = (spec(n), spec(1), spec(1))
    out_shape = (out_sd(n), out_sd(1), out_sd(1))
    scratch = [
        scratch_t(n),
        scratch_t(n),
        scratch_t(n),
        scratch_t((n + 1) * m),
        scratch_t((n + 1) * mm),
    ]
    mode_out, ll, diff = pl.pallas_call(
        functools.partial(_laplace_step_kernel, n, m, dist),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return unpack(mode_out), ll.reshape(Cn), diff.reshape(Cn)


def fused_laplace_step_batched(spec, mode, axis_size, interpret=False):
    """Batched Laplace-iteration body.  ``spec`` an NGSpec (leaves possibly
    batched), mode (B, n).  Returns (mode_new, ll, diff) or None."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported(n, m):
        return None
    if spec.distribution not in (_SVM, _POISSON, _BINOMIAL, _NEGBIN,
                                 _GAMMA):
        return None
    if spec.Z.shape[-2] != 1 or spec.T.shape[-3] != 1 or \
            spec.R.shape[-3] != 1 or spec.C.shape[-2] != 1:
        return None
    mode = jnp.asarray(mode)
    if mode.ndim == 1:
        mode = jnp.broadcast_to(mode, (axis_size, n))
    B = mode.shape[0]
    dt = mode.dtype

    def dense(x, core_ndim):
        x = jnp.asarray(x, dt)
        if x.ndim == core_ndim:
            x = jnp.broadcast_to(x, (B,) + x.shape)
        return x

    y = dense(spec.y, 1)
    u = dense(spec.u, 1)
    D = dense(spec.D, 1)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (B, n))
    Z = dense(spec.Z, 2)[:, 0]
    T = dense(spec.T, 3)[:, 0]
    R = dense(spec.R, 3)[:, 0]
    RR = jnp.einsum('cij,ckj->cik', R, R)
    a1 = dense(spec.a1, 1)
    P1 = dense(spec.P1, 2)
    C = dense(spec.C, 2)[:, 0]
    phi_arr = jnp.asarray(spec.phi, dt)
    phi = jnp.full((B, 1), phi_arr, dt) if phi_arr.ndim == 0 \
        else phi_arr.reshape(B, 1)
    sc_rows, io_rows = _kf_rows(n, m)
    subs = _pick_subs(sc_rows, io_rows + 2 * n + 3, B,
                      itemsize=y.dtype.itemsize)
    arrays = _pad_block([y, u, D, Z, T, RR, a1, P1, C, phi, mode],
                        B, subs)
    y, u, D, Z, T, RR, a1, P1, C, phi, mode_p = arrays
    mode_new, ll, diff = _fused_laplace_call(
        y, u, D, Z, T, RR, a1, P1, C, phi, mode_p, n=n, m=m,
        dist=spec.distribution, subs=subs, interpret=interpret)
    return mode_new[:B], ll[:B], diff[:B]


def _laplace_step_base(spec, mode):
    from ..core import distributions as fam
    from ..inference.approx import signal_from_states
    from . import kalman
    n = spec.y.shape[-1]
    yt, hh = fam.laplace_match(spec.distribution, spec.y, spec.u, spec.phi,
                               mode)
    H = jnp.sqrt(jnp.where(jnp.isfinite(hh) & (hh > 0), hh, 1.0))
    yt = jnp.where(spec.obs_mask, yt, jnp.nan)
    g = spec.approx_gaussian(yt, H)
    alpha, ll = kalman.fast_smoother_ll(g)
    new_mode = signal_from_states(spec, alpha[:n])
    diff = jnp.sum(jnp.square(new_mode - mode)) / n
    return new_mode, ll, diff


@jax.custom_batching.custom_vmap
def laplace_step_auto(spec, mode):
    """One Laplace-iteration body: (new mode, KF loglik of the approximating
    model at match(mode), mean-squared signal change).  Batched calls fuse
    match + filter + smoother + signal into one kernel."""
    return _laplace_step_base(spec, mode)


@laplace_step_auto.def_vmap
def _laplace_step_vmap(axis_size, in_batched, spec, mode):
    from ..core import config as _config
    if _config.use_fused():
        out = fused_laplace_step_batched(spec, mode, axis_size,
                                         interpret=_interpret_mode())
        if out is not None:
            return out, (True, True, True)
        _fallback_notice("laplace-step", n=spec.y.shape[-1],
                         m=spec.a1.shape[-1])
    spec_b, mode_b = in_batched
    axes = (jax.tree_util.tree_map(lambda b: 0 if b else None, spec_b),
            0 if mode_b else None)
    out = jax.vmap(_laplace_step_base, in_axes=axes)(spec, mode)
    return out, (True, True, True)


def _laplace_solve_kernel(n: int, m: int, dist: int, max_iter: int,
                          conv_tol: float,
                          y_ref, u_ref, d_ref, z_ref, t_ref, rr_ref,
                          a1_ref, p1_ref, c_ref, phi_ref, mode0_ref,
                          mode_ref, prev_ref, ll_ref, niter_ref, diff_ref,
                          v_s, f_s, ok_s, at_s, pt_s):
    """The ENTIRE Laplace mode iteration in one kernel invocation: a
    `while_loop` of {match -> filter -> smooth -> new mode} with
    convergence tested per 128-lane block (the reference iterates one
    model at a time, `/root/reference/src/model_ssm_ung.cpp:87-140`; the
    XLA fallback synchronises over the whole batch — block-local stopping
    only changes modes below conv_tol)."""
    mm = m * m
    Z, T, RR, Cv, a0, P0 = _load_system(m, z_ref, t_ref, rr_ref, a1_ref,
                                        p1_ref, c_ref)
    phi = phi_ref[0]
    dt = mode0_ref.dtype

    def copy_rows(src, dst):
        def cp(t, _):
            dst[t] = src[t]
            return 0
        jax.lax.fori_loop(0, n, cp, 0)

    copy_rows(mode0_ref, mode_ref)
    copy_rows(mode0_ref, prev_ref)

    def get_obs(t):
        y = y_ref[t]
        u = u_ref[t]
        s = prev_ref[t]
        yt, hh = _lane_laplace_match(dist, y, u, phi, s)
        hh = jnp.where(jnp.isfinite(hh) & (hh > 0), hh, 1.0)
        yt = jnp.where(jnp.isfinite(y), yt, jnp.nan)
        return yt, hh, d_ref[t]

    zero_lane = jnp.zeros(y_ref.shape[1:], dt)

    def one_step():
        """prev_ref -> mode_ref; returns (ll, diff) lane vectors."""
        _, _, ll = _forward_filter(n, m, None, None, None, Z, T, RR, Cv,
                                   a0, P0, v_s, f_s, ok_s, at_s, pt_s,
                                   get_obs=get_obs)
        r0 = [zero_lane for _ in range(m)]

        def bwd(i, carry):
            r, dacc = carry
            t = n - 1 - i
            v = v_s[t]
            F = f_s[t]
            okf = ok_s[t]
            P = [pt_s[t * mm + ij] for ij in range(mm)]
            K = _recompute_K(m, P, Z, F, okf)
            TK = []
            for i2 in range(m):
                s = zero_lane
                for l in range(m):
                    s = s + T[i2][l] * K[l]
                TK.append(s)
            Ttr, Ltr = [], []
            for j in range(m):
                st = zero_lane
                sl = zero_lane
                for i2 in range(m):
                    st = st + T[i2][j] * r[i2]
                    sl = sl + (T[i2][j] - TK[i2] * Z[j]) * r[i2]
                Ttr.append(st)
                Ltr.append(sl)
            r_new = [okf * (Z[j] * (v / F) + Ltr[j]) + (1.0 - okf) * Ttr[j]
                     for j in range(m)]
            alpha_t = []
            for i2 in range(m):
                s = at_s[t * m + i2]
                for j in range(m):
                    s = s + P[i2 * m + j] * r_new[j]
                alpha_t.append(s)
            if dist == _SVM:
                new_mode = alpha_t[0]
            else:
                new_mode = d_ref[t]
                for i2 in range(m):
                    new_mode = new_mode + Z[i2] * alpha_t[i2]
            mode_ref[t] = new_mode
            delta = new_mode - prev_ref[t]
            return r_new, dacc + delta * delta

        _, dacc = jax.lax.fori_loop(0, n, bwd, (r0, zero_lane))
        return ll, dacc / n

    def cond(carry):
        i, diff, _ = carry
        return (i < max_iter) & (jnp.max(diff) > conv_tol)

    def body(carry):
        i, _, _ = carry
        copy_rows(mode_ref, prev_ref)
        ll, diff = one_step()
        return i + 1, diff, ll

    init = (jnp.int32(0), jnp.full_like(zero_lane, conv_tol + 1.0),
            zero_lane)
    niter, diff, ll = jax.lax.while_loop(cond, body, init)
    ll_ref[0] = ll
    diff_ref[0] = diff
    niter_ref[0] = jnp.full_like(zero_lane, niter.astype(dt))


@functools.partial(jax.jit, static_argnames=("n", "m", "dist", "max_iter",
                                             "conv_tol", "subs",
                                             "interpret"))
def _fused_laplace_solve_call(y, u, d, z, t, rr, a1, p1, c, phi, mode0, *,
                              n, m, dist, max_iter, conv_tol, subs=1,
                              interpret=False):
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    args = (lanes_last(y, n), lanes_last(u, n), lanes_last(d, n),
            lanes_last(z, m), lanes_last(t, mm), lanes_last(rr, mm),
            lanes_last(a1, m), lanes_last(p1, mm), lanes_last(c, m),
            lanes_last(phi, 1), lanes_last(mode0, n))
    grid = (Cn // (subs * LANES),)

    in_specs = [spec(n), spec(n), spec(n), spec(m), spec(mm), spec(mm),
                spec(m), spec(mm), spec(m), spec(1), spec(n)]
    out_specs = (spec(n), spec(n), spec(1), spec(1), spec(1))
    out_shape = (out_sd(n), out_sd(n), out_sd(1), out_sd(1), out_sd(1))
    scratch = [
        scratch_t(n),
        scratch_t(n),
        scratch_t(n),
        scratch_t((n + 1) * m),
        scratch_t((n + 1) * mm),
    ]
    mode, prev, ll, niter, diff = pl.pallas_call(
        functools.partial(_laplace_solve_kernel, n, m, dist, max_iter,
                          conv_tol),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return (unpack(mode), unpack(prev),
            niter.reshape(Cn).astype(jnp.int32), diff.reshape(Cn),
            ll.reshape(Cn))


def fused_laplace_solve_batched(spec, mode0, conv_tol, max_iter, axis_size,
                                interpret=False):
    """Batched full Laplace solve.  Returns (mode, prev, niter, diff, ll)
    or None if unsupported."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported(n, m):
        return None
    if spec.distribution not in (_SVM, _POISSON, _BINOMIAL, _NEGBIN,
                                 _GAMMA):
        return None
    if spec.Z.shape[-2] != 1 or spec.T.shape[-3] != 1 or \
            spec.R.shape[-3] != 1 or spec.C.shape[-2] != 1:
        return None
    mode0 = jnp.asarray(mode0)
    if mode0.ndim == 1:
        mode0 = jnp.broadcast_to(mode0, (axis_size, n))
    B = mode0.shape[0]
    dt = mode0.dtype

    def dense(x, core_ndim):
        x = jnp.asarray(x, dt)
        if x.ndim == core_ndim:
            x = jnp.broadcast_to(x, (B,) + x.shape)
        return x

    y = dense(spec.y, 1)
    u = dense(spec.u, 1)
    D = dense(spec.D, 1)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (B, n))
    Z = dense(spec.Z, 2)[:, 0]
    T = dense(spec.T, 3)[:, 0]
    R = dense(spec.R, 3)[:, 0]
    RR = jnp.einsum('cij,ckj->cik', R, R)
    a1 = dense(spec.a1, 1)
    P1 = dense(spec.P1, 2)
    C = dense(spec.C, 2)[:, 0]
    phi_arr = jnp.asarray(spec.phi, dt)
    phi = jnp.full((B, 1), phi_arr, dt) if phi_arr.ndim == 0 \
        else phi_arr.reshape(B, 1)
    sc_rows, io_rows = _kf_rows(n, m)
    subs = _pick_subs(sc_rows, io_rows + 4 * n + 4, B,
                      itemsize=y.dtype.itemsize)
    if subs == 1 and B >= 8 * LANES:
        # big batch but the whole-solve kernel cannot pack sublanes within
        # VMEM: decline, so the caller's fallback (XLA while_loop over the
        # sublane-packed Laplace-STEP kernel, whose smaller io fits at 8)
        # runs instead — fewer total instructions than a lanes-only solve
        return None
    arrays = _pad_block([y, u, D, Z, T, RR, a1, P1, C, phi, mode0],
                        B, subs)
    y, u, D, Z, T, RR, a1, P1, C, phi, mode0p = arrays
    mode, prev, niter, diff, ll = _fused_laplace_solve_call(
        y, u, D, Z, T, RR, a1, P1, C, phi, mode0p, n=n, m=m,
        dist=spec.distribution, max_iter=int(max_iter),
        conv_tol=float(conv_tol), subs=subs, interpret=interpret)
    return mode[:B], prev[:B], niter[:B], diff[:B], ll[:B]


def _laplace_solve_base(spec, mode0, conv_tol, max_iter):
    """XLA while_loop over laplace_step_auto — whole-batch convergence."""

    def cond(carry):
        _, _, i, diff, _ = carry
        return (i < max_iter) & (diff > conv_tol)

    def body(carry):
        mode, _, i, _, _ = carry
        new_mode, gll, diff = laplace_step_auto(spec, mode)
        return (new_mode, mode, i + 1, diff, gll)

    dt = mode0.dtype
    init = (mode0, mode0, jnp.zeros((), jnp.int32),
            jnp.asarray(conv_tol + 1.0, dt), jnp.zeros((), dt))
    mode, prev, niter, diff, gll = jax.lax.while_loop(cond, body, init)
    return mode, prev, niter, diff, gll


_LAPLACE_SOLVERS: dict = {}


def get_laplace_solver(conv_tol: float, max_iter: int):
    """custom_vmap'd full Laplace solve, cached per (conv_tol, max_iter)."""
    key = (float(conv_tol), int(max_iter))
    fn = _LAPLACE_SOLVERS.get(key)
    if fn is not None:
        return fn

    @jax.custom_batching.custom_vmap
    def solve(spec, mode0):
        return _laplace_solve_base(spec, mode0, key[0], key[1])

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, spec, mode0):
        from ..core import config as _config
        if _config.use_fused():
            out = fused_laplace_solve_batched(spec, mode0, key[0], key[1],
                                              axis_size,
                                              interpret=_interpret_mode())
            if out is not None:
                return out, (True, True, True, True, True)
            _fallback_notice("laplace-solve", n=spec.y.shape[-1],
                             m=spec.a1.shape[-1])
        spec_b, mode_b = in_batched
        axes = (jax.tree_util.tree_map(lambda b: 0 if b else None, spec_b),
                0 if mode_b else None)
        out = jax.vmap(lambda s, m0: _laplace_solve_base(
            s, m0, key[0], key[1]), in_axes=axes)(spec, mode0)
        return out, (True, True, True, True, True)

    _LAPLACE_SOLVERS[key] = solve
    return solve


# ---------------------------------------------------------------------------
# fused RTS smoother + psi-APF conditional proposal factors
# ---------------------------------------------------------------------------
# The IS post-correction runs, per stored draw, a full variance smoother and
# the conversion of (Vt, ccov) into the conditional proposal N(ahat_t +
# A_t (a_{t-1} - ahat_{t-1}), L_t L_t') (`/root/reference/src/
# conditional_dist.cpp:4-67`).  Fusing filter + RTS backward pass + the
# closed-form m<=2 eigen-factorisations into one draws-in-lanes kernel
# removes ~460 tiny scan dispatches per correction batch.

_MAX_M_RTS = 4     # m <= 2 closed-form eigh; m in {3,4} cyclic Jacobi


def _rts_rows(n: int, m: int):
    """(scratch_rows, io_rows) of the streamed-io RTS kernel: per-time
    scratch (v, F, ok, at, Pt) + the six chunk buffers; obs in and
    ahat/Lb/Ab out stream through double-buffered DMA."""
    mm = m * m
    scratch = (3 * n + (n + 1) * (m + mm)
               + 2 * _PSI_CHUNK * (3 + m + 2 * mm))
    io = 3 * m + 3 * mm + 2
    return scratch, io


def _supported_rts(n: int, m: int) -> bool:
    sc, io = _rts_rows(n, m)
    return m <= _MAX_M_RTS and (sc + io) * LANES * 4 < _VMEM_LIMIT_BYTES


def _lane_eig2(v00, v01, v11):
    """Closed-form symmetric 2x2 eigensystem on lane vectors (cf.
    ops.chol._eigh2x2).  Returns (w_small, w_big, u1, u2) where the
    big-eigenvalue eigenvector is (u1, u2) and the small one (-u2, u1)."""
    half_tr = 0.5 * (v00 + v11)
    half_diff = 0.5 * (v00 - v11)
    r = jnp.sqrt(half_diff * half_diff + v01 * v01)
    use_first = jnp.abs(r - half_diff) > jnp.abs(r + half_diff)
    u1 = jnp.where(use_first, v01, r + half_diff)
    u2 = jnp.where(use_first, r - half_diff, v01)
    nrm = jnp.sqrt(u1 * u1 + u2 * u2)
    ok = nrm > 0
    nrm = jnp.where(ok, nrm, 1.0)
    u1 = jnp.where(ok, u1 / nrm, 1.0)
    u2 = jnp.where(ok, u2 / nrm, 0.0)
    return half_tr - r, half_tr + r, u1, u2


def _lane_jacobi(m, V, sweeps=6):
    """Cyclic-Jacobi symmetric eigensystem on lane vectors for m in {3, 4}
    (m <= 2 has closed forms).  6 sweeps drive the off-diagonal mass below
    f32 roundoff for these tiny matrices.  Rotation angles via the
    branch-free sign/tau formulation — no atan2, Mosaic-safe.  Returns
    (w: list[m] eigenvalues, U: row-major list[m][m], columns are the
    eigenvectors), unordered (callers are order-invariant)."""
    A = [[0.5 * (V[i * m + j] + V[j * m + i]) for j in range(m)]
         for i in range(m)]
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(one)
    U = [[one if i == j else zero for j in range(m)] for i in range(m)]
    tiny = 1e-30
    for _ in range(sweeps):
        for p in range(m - 1):
            for q in range(p + 1, m):
                apq = A[p][q]
                rot = jnp.abs(apq) > tiny
                apqs = jnp.where(rot, apq, 1.0)
                tau = (A[q][q] - A[p][p]) / (2.0 * apqs)
                sgn = jnp.where(tau >= 0, 1.0, -1.0)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(rot, t, 0.0)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                app_new = A[p][p] - t * apq
                aqq_new = A[q][q] + t * apq
                for k in range(m):
                    if k in (p, q):
                        continue
                    akp = A[k][p]
                    akq = A[k][q]
                    A[k][p] = A[p][k] = c * akp - s * akq
                    A[k][q] = A[q][k] = s * akp + c * akq
                A[p][p] = app_new
                A[q][q] = aqq_new
                A[p][q] = A[q][p] = jnp.where(rot, zero, apq)
                for k in range(m):
                    ukp = U[k][p]
                    ukq = U[k][q]
                    U[k][p] = c * ukp - s * ukq
                    U[k][q] = s * ukp + c * ukq
    return [A[i][i] for i in range(m)], U


def _lane_pinv(m, V, eps):
    """Tikhonov-smoothed PSD pseudo-inverse on lane vectors; V is a list of
    mm entries.  Mirrors ops.chol._psd_pinv exactly: lambda/(lambda^2 +
    delta^2) with delta = 4 m eps lambda_max — a hard keep/drop tolerance
    is an f32 cliff (see _psd_pinv docstring)."""
    if m == 1:
        v = jnp.maximum(V[0], 0.0)
        delta = 4.0 * eps * v
        den = v * v + delta * delta
        return [jnp.where(den > 0, v / jnp.where(den > 0, den, 1.0), 0.0)]
    if m == 2:
        w1, w2, u1, u2 = _lane_eig2(V[0], 0.5 * (V[1] + V[2]), V[3])
        w1 = jnp.maximum(w1, 0.0)
        w2 = jnp.maximum(w2, 0.0)
        delta = 8.0 * eps * w2                  # 4*m*eps*max(w), m = 2

        def inv(w):
            den = w * w + delta * delta
            return jnp.where(den > 0, w / jnp.where(den > 0, den, 1.0), 0.0)

        iw1, iw2 = inv(w1), inv(w2)
        return [iw1 * u2 * u2 + iw2 * u1 * u1,
                -iw1 * u2 * u1 + iw2 * u1 * u2,
                -iw1 * u2 * u1 + iw2 * u1 * u2,
                iw1 * u1 * u1 + iw2 * u2 * u2]
    ws, U = _lane_jacobi(m, V)
    ws = [jnp.maximum(w, 0.0) for w in ws]
    wmax = ws[0]
    for w in ws[1:]:
        wmax = jnp.maximum(wmax, w)
    delta = 4.0 * m * eps * wmax

    def inv(w):
        den = w * w + delta * delta
        return jnp.where(den > 0, w / jnp.where(den > 0, den, 1.0), 0.0)

    iws = [inv(w) for w in ws]
    out = []
    for i in range(m):
        for j in range(m):
            s = U[i][0] * iws[0] * U[j][0]
            for k in range(1, m):
                s = s + U[i][k] * iws[k] * U[j][k]
            out.append(s)
    return out


def _lane_factor(m, V):
    """Clipped symmetric square-root factor on lane vectors; mirrors
    ops.chol._psd_factor (columns = eigvecs * sqrt(clipped eigvals))."""
    if m == 1:
        return [jnp.sqrt(jnp.maximum(V[0], 0.0))]
    if m == 2:
        w1, w2, u1, u2 = _lane_eig2(V[0], 0.5 * (V[1] + V[2]), V[3])
        s1 = jnp.sqrt(jnp.maximum(w1, 0.0))
        s2 = jnp.sqrt(jnp.maximum(w2, 0.0))
        # B = [col_small * s1, col_big * s2], col_small = (-u2, u1)
        return [-u2 * s1, u1 * s2, u1 * s1, u2 * s2]
    ws, U = _lane_jacobi(m, V)
    sq = [jnp.sqrt(jnp.maximum(w, 0.0)) for w in ws]
    return [U[i][j] * sq[j] for i in range(m) for j in range(m)]


def _rts_kernel(n: int, m: int, subs: int,
                z_ref, t_ref, rr_ref, a1_ref, p1_ref, c_ref,
                obs_hbm, ahat_hbm, lcac_hbm,
                v_s, f_s, ok_s, at_s, pt_s,
                obs_buf, ahat_buf, lcac_buf, dma_sem):
    """Forward filter + RTS backward pass (means, variances, lag-1 ccov) +
    conditional proposal factors, one block of SUBS*LANES draws.

    Streamed io (double-buffered _PSI_CHUNK-step DMA chunks):
      in  obs row t*3 + k:        [y, h2, D][k]
      out ahat row t*m + i        (written in reverse chunks by the
                                   backward pass)
      out lcac row t*2mm + ij:    [Lcond (mm), Acond (mm)] (forward chunks
                                   by the factor pass)
    Only the per-time scratch (v, F, ok, at, Pt, Vt, ccov) lives in VMEM
    full-length; the io streams keep the kernel sublane-packable."""
    mm = m * m
    ch = _PSI_CHUNK
    F2 = 2 * mm
    blk = pl.program_id(0)
    dt = v_s.dtype
    eps = float(np.finfo(np.float32).eps) if dt == jnp.float32 \
        else float(np.finfo(np.float64).eps)
    Z, T, RR, Cv, a0, P0 = _load_system(m, z_ref, t_ref, rr_ref, a1_ref,
                                        p1_ref, c_ref)
    nchf = -(-n // ch)            # forward obs chunks over n steps
    nchb = -(-(n + 1) // ch)      # output chunks over n+1 steps

    def mk_in_dma(hbm, buf, rpc, k):
        if subs == 1:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(c * rpc, rpc), pl.ds(blk * LANES, LANES)],
                    buf.at[slot], dma_sem.at[slot, k])
        else:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(c * rpc, rpc),
                           pl.ds(blk * subs, subs), :],
                    buf.at[slot], dma_sem.at[slot, k])
        return dma

    def mk_out_dma(buf, hbm, rpc, k):
        if subs == 1:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    buf.at[slot],
                    hbm.at[pl.ds(c * rpc, rpc), pl.ds(blk * LANES, LANES)],
                    dma_sem.at[slot, k])
        else:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    buf.at[slot],
                    hbm.at[pl.ds(c * rpc, rpc),
                           pl.ds(blk * subs, subs), :],
                    dma_sem.at[slot, k])
        return dma

    obs_dma = mk_in_dma(obs_hbm, obs_buf, ch * 3, 0)
    ahat_dma = mk_out_dma(ahat_buf, ahat_hbm, ch * m, 1)
    lcac_dma = mk_out_dma(lcac_buf, lcac_hbm, ch * F2, 2)

    # ---- forward pass, obs streamed ----
    obs_dma(0, 0).start()
    if nchf > 1:
        obs_dma(1, 1).start()
    carry = None
    for c in range(nchf):
        slot = c % 2
        if c > 0 and c + 1 < nchf:
            obs_dma((c + 1) % 2, c + 1).start()
        obs_dma(slot, c).wait()
        base = c * ch

        def get_obs(t, _slot=slot, _base=base):
            lt = t - _base
            return (obs_buf[_slot, lt * 3 + 0],
                    obs_buf[_slot, lt * 3 + 1],
                    obs_buf[_slot, lt * 3 + 2])

        carry = _forward_filter(
            n, m, None, None, None, Z, T, RR, Cv, a0, P0,
            v_s, f_s, ok_s, at_s, pt_s, get_obs=get_obs,
            t_range=(base, min(base + ch, n)), carry_in=carry)
    a_n, P_n, _ = carry
    zero = jnp.zeros_like(a_n[0])

    # ---- backward pass: smoothed means + BACKWARD (FFBS) proposal
    # factors, streamed out in reverse chunks ----
    # Ab[t] = J_t = Ptt_t T' pinv(P_{t+1|t}) (the smoothing gain),
    # Lb[t] = factor(Ptt_t - J_t P_{t+1|t} J_t'); the smoothed mean shares
    # the same recursion (see ops/kalman.smoother_bwd_factors).  No
    # smoothed-covariance pseudo-inverse appears anywhere: the reference's
    # forward conditionals (ccov' V^+, `conditional_dist.cpp:4-67`) lose
    # V's small eigenvalues to f32 cancellation and the gains blow up
    # (|A| ~ 500 observed on TPU); the filter-quantity form is f32-stable
    # by construction — and drops the old separate factor pass entirely.
    # Mosaic workaround: rank-1 (LANES,) loop-carried values in this
    # backward fori_loop crash the TPU compiler's layout inference
    # ("Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs 2)",
    # layout.h:320) when SUBS == 1 and the carry is USED in arithmetic;
    # carrying them as (1, LANES) sidesteps it.  SUBS == 8 values are
    # already rank-2.
    def _wrap(x):
        return x.reshape(1, -1) if subs == 1 else x

    def _unwrap(c):
        return c[0] if subs == 1 else c

    def make_bwd(slot, lo, hi):
        def bwd(it, carry_in):
            ah_n = [_unwrap(c) for c in carry_in]
            t = hi - 1 - it
            v = v_s[t]
            F = f_s[t]
            okf = ok_s[t]
            P = [pt_s[t * mm + ij] for ij in range(mm)]
            Pn1 = [pt_s[(t + 1) * mm + ij] for ij in range(mm)]
            # filtered moments from staged predicted stats, JOSEPH form:
            # the short form P - (PZ)(PZ)'/F cancels diffuse-P1-scale
            # quantities at strongly-informative steps (t = 0 with
            # P1 = 100 I loses Ptt to f32 roundoff, inflating the t = 0
            # backward conditional variance ~20x); Joseph
            # (I-KZ)P(I-KZ)' + h2 KK' keeps the error relative.
            PZ = []
            for i in range(m):
                s = P[i * m] * Z[0]
                for j in range(1, m):
                    s = s + P[i * m + j] * Z[j]
                PZ.append(s)
            ZPZ = PZ[0] * Z[0]
            for i in range(1, m):
                ZPZ = ZPZ + PZ[i] * Z[i]
            h2 = F - ZPZ                    # exact when ok; unused masked
            K = [okf * PZ[i] / F for i in range(m)]
            att = [at_s[t * m + i] + K[i] * v for i in range(m)]
            BP = [P[i * m + j] - K[i] * PZ[j]
                  for i in range(m) for j in range(m)]
            BPZ = [PZ[i] - K[i] * ZPZ for i in range(m)]
            Ptt = [BP[i * m + j] - BPZ[i] * K[j] + h2 * K[i] * K[j]
                   for i in range(m) for j in range(m)]
            Ptt = [0.5 * (Ptt[i * m + j] + Ptt[j * m + i])
                   for i in range(m) for j in range(m)]
            # J = Ptt T' pinv(P_{t+1|t})
            Pinv = _lane_pinv(m, Pn1, eps)
            PT = [[None] * m for _ in range(m)]       # Ptt T'
            for i in range(m):
                for j in range(m):
                    s = Ptt[i * m] * T[j][0]
                    for l in range(1, m):
                        s = s + Ptt[i * m + l] * T[j][l]
                    PT[i][j] = s
            J = [[None] * m for _ in range(m)]
            for i in range(m):
                for j in range(m):
                    s = PT[i][0] * Pinv[j]
                    for l in range(1, m):
                        s = s + PT[i][l] * Pinv[l * m + j]
                    J[i][j] = s
            # ahat_t = att + J (ahat_{t+1} - a_{t+1|t})
            dv = [ah_n[j] - at_s[(t + 1) * m + j] for j in range(m)]
            ah = []
            for i in range(m):
                s = att[i]
                for j in range(m):
                    s = s + J[i][j] * dv[j]
                ah.append(s)
            lt = t - lo
            for i in range(m):
                ahat_buf[slot, lt * m + i] = ah[i]
            # Joseph form of the backward conditional covariance:
            # Sig = (I - J T) Ptt (I - J T)' + J RR J' — identical to
            # Ptt - J P_pred J' but all-additive (the difference form
            # cancels to ~0 for near-deterministic coordinates and f32
            # roundoff over-disperses them ~1e6x)
            ImJT = [[None] * m for _ in range(m)]
            for i in range(m):
                for j in range(m):
                    s = J[i][0] * T[0][j]
                    for l in range(1, m):
                        s = s + J[i][l] * T[l][j]
                    ImJT[i][j] = (1.0 if i == j else 0.0) - s
            MP = [[None] * m for _ in range(m)]       # (I-JT) Ptt
            for i in range(m):
                for j in range(m):
                    s = ImJT[i][0] * Ptt[j]
                    for l in range(1, m):
                        s = s + ImJT[i][l] * Ptt[l * m + j]
                    MP[i][j] = s
            JR = [[None] * m for _ in range(m)]       # J RR
            for i in range(m):
                for j in range(m):
                    s = J[i][0] * RR[0][j]
                    for l in range(1, m):
                        s = s + J[i][l] * RR[l][j]
                    JR[i][j] = s
            Sig = [None] * mm
            for i in range(m):
                for j in range(m):
                    s = jnp.zeros_like(okf)
                    for l in range(m):
                        s = s + MP[i][l] * ImJT[j][l] + JR[i][l] * J[j][l]
                    Sig[i * m + j] = s
            Sig = [0.5 * (Sig[i * m + j] + Sig[j * m + i])
                   for i in range(m) for j in range(m)]
            L = _lane_factor(m, Sig)
            for ij in range(mm):
                lcac_buf[slot, lt * F2 + ij] = L[ij]
            for i in range(m):
                for j in range(m):
                    lcac_buf[slot, lt * F2 + mm + i * m + j] = J[i][j]
            return [_wrap(x) for x in ah]
        return bwd

    carry = [_wrap(a_n[i]) for i in range(m)]
    for cb in range(nchb - 1, -1, -1):
        slot = cb % 2
        if cb + 2 < nchb:                       # buffer reuse: wait out-DMA
            ahat_dma(slot, cb + 2).wait()
            lcac_dma(slot, cb + 2).wait()
        lo = cb * ch
        hi = min((cb + 1) * ch, n + 1)
        if hi == n + 1:                          # the t = n entry:
            # alpha_n ~ N(a_n, P_n) (smoothed marginal; no obs at n)
            for i in range(m):
                ahat_buf[slot, (n - lo) * m + i] = a_n[i]
            Ln = _lane_factor(m, [P_n[ij] for ij in range(mm)])
            for ij in range(mm):
                lcac_buf[slot, (n - lo) * F2 + ij] = Ln[ij]
                lcac_buf[slot, (n - lo) * F2 + mm + ij] = zero
            hi = n
        if lo < hi:
            carry = jax.lax.fori_loop(0, hi - lo, make_bwd(slot, lo, hi),
                                      carry)
        ahat_dma(slot, cb).start()
        lcac_dma(slot, cb).start()

    # the last two chunks started are 1, 0 (reverse order)
    for c in (1, 0):
        if c < nchb:
            ahat_dma(c % 2, c).wait()
            lcac_dma(c % 2, c).wait()


@functools.partial(jax.jit, static_argnames=("n", "m", "subs", "interpret"))
def _fused_rts_call(y, h2, d, z, t, rr, a1, p1, c, *, n, m, subs=1,
                    interpret=False):
    """Returns (ahat (C, n+1, m), Lcond (C, n+1, m, m),
    Acond (C, n+1, m, m)) via the streamed-io RTS kernel."""
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    ch = _PSI_CHUNK
    nchf = -(-n // ch)
    nchb = -(-(n + 1) // ch)
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    def pad_steps(x, per_step, steps):
        x = x.reshape(Cn, -1, per_step)
        S = x.shape[1]
        if S < steps:
            x = jnp.concatenate(
                [x, jnp.zeros((Cn, steps - S, per_step), dt)], axis=1)
        return x.reshape(Cn, steps * per_step)

    obs = jnp.stack([y, h2, d], axis=2)                 # (Cn, n, 3)
    obs_p = pad_steps(obs.reshape(Cn, n * 3), 3, nchf * ch)

    args = (lanes_last(z, m), lanes_last(t, mm), lanes_last(rr, mm),
            lanes_last(a1, m), lanes_last(p1, mm), lanes_last(c, m),
            lanes_last(obs_p, nchf * ch * 3))
    grid = (Cn // (subs * LANES),)
    in_specs = [spec(m), spec(mm), spec(mm), spec(m), spec(mm), spec(m),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY))
    out_shape = (out_sd(nchb * ch * m), out_sd(nchb * ch * 2 * mm))

    def chunk_buf(rows_per_step):
        if subs == 1:
            return pltpu.VMEM((2, ch * rows_per_step, LANES), dt)
        return pltpu.VMEM((2, ch * rows_per_step, subs, LANES), dt)

    scratch = [
        scratch_t(n), scratch_t(n), scratch_t(n),        # v, F, ok
        scratch_t((n + 1) * m),                          # at
        scratch_t((n + 1) * mm),                         # Pt
        chunk_buf(3), chunk_buf(m), chunk_buf(2 * mm),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    ahat_r, lcac_r = pl.pallas_call(
        functools.partial(_rts_kernel, n, m, subs),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    ahat = unpack(ahat_r)[:, :(n + 1) * m].reshape(Cn, n + 1, m)
    lcac = unpack(lcac_r)[:, :(n + 1) * 2 * mm].reshape(Cn, n + 1, 2, mm)
    Lc = lcac[:, :, 0].reshape(Cn, n + 1, m, m)
    Ac = lcac[:, :, 1].reshape(Cn, n + 1, m, m)
    return ahat, Lc, Ac


def fused_smoother_bwd_factors_batched(spec, axis_size, interpret=False):
    """Batched (alphahat, Lb, Ab) — the BACKWARD (FFBS) proposal factors —
    via the fused RTS kernel, or None if outside the kernel contract."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported_rts(n, m):
        return None
    prep = _batched_inputs(spec, axis_size)
    if prep is None:
        return None
    y, h2, d, z, t, rr, a1, p1, c, n, m = prep
    B = y.shape[0]
    sc_rows, io_rows = _rts_rows(n, m)
    subs = _pick_subs(sc_rows, io_rows, B, itemsize=y.dtype.itemsize)
    y, h2, d, z, t, rr, a1, p1, c = _pad_block(
        (y, h2, d, z, t, rr, a1, p1, c), B, subs)
    ahat, Lc, Ac = _fused_rts_call(y, h2, d, z, t, rr, a1, p1, c, n=n, m=m,
                                   subs=subs, interpret=interpret)
    return ahat[:B], Lc[:B], Ac[:B]


# ---------------------------------------------------------------------------
# fused psi-APF log-weight kernel
# ---------------------------------------------------------------------------
# One lane = one IS-correction draw; the N-particle ensemble lives in
# unrolled registers (N <= 16: the psi-APF needs 10-50 particles,
# `/root/reference/vignettes/psi_pf.Rmd:34-80`).  Stratified resampling is
# a branch-free one-hot contraction (no per-lane gather exists on the VPU).
# Randomness (normals + resampling uniforms) is injected as inputs so the
# kernel is deterministic given the same threefry stream as the scan path.

_MAX_N_PSI = 32

# family codes duplicated from core.spec to avoid an import cycle
_SVM, _POISSON, _BINOMIAL, _NEGBIN, _GAMMA = 0, 1, 2, 3, 4


_PSI_CHUNK = 16    # time steps per streamed randomness DMA chunk


def _psi_rows(n: int, m: int, N: int):
    """(scratch_rows, io_rows) of the psi kernel.  Everything per-step —
    pseudo/actual observations, conditional-proposal factors, and the
    injected randomness — streams HBM->VMEM in double-buffered
    _PSI_CHUNK-step chunks, so VMEM holds only z/phi and the four chunk
    buffers regardless of the series length; the draws axis packs
    sublanes (SUBS=8) at any realistic n."""
    per_step = 6 + (m + 2 * m * m) + N * m + N
    scratch = 2 * _PSI_CHUNK * per_step
    io = m + 2
    return scratch, io


def _supported_psi(n: int, m: int, N: int) -> bool:
    scratch, io = _psi_rows(n, m, N)
    return (m <= _MAX_M_RTS and N <= _MAX_N_PSI
            and (scratch + io) * LANES * 4 < _VMEM_LIMIT_BYTES)


def _lane_safe_exp(x):
    return jnp.exp(jnp.minimum(x, 80.0))


def _lane_log_weight(dist, y, u, phi, s, yt, ht):
    """log g(y|s) - log g~(yt|s) on lane vectors; mirrors
    core.distributions.log_weights for the univariate families."""
    ok = jnp.isfinite(y)
    ys = jnp.where(ok, y, 0.0)
    if dist == _SVM:
        w = -0.5 * (s + jnp.square(ys / phi) * _lane_safe_exp(-s))
    elif dist == _POISSON:
        w = ys * s - u * _lane_safe_exp(s)
    elif dist == _BINOMIAL:
        # logaddexp(0, s) = max(s, 0) + log1p(exp(-|s|))
        w = ys * s - u * (jnp.maximum(s, 0.0)
                          + jnp.log1p(jnp.exp(-jnp.abs(s))))
    elif dist == _NEGBIN:
        w = ys * s - (ys + phi) * jnp.log(phi + u * _lane_safe_exp(s))
    elif dist == _GAMMA:
        w = -phi * (s + ys * _lane_safe_exp(-s) / u)
    else:
        raise ValueError(f"psi kernel: unsupported family {dist}")
    okg = jnp.isfinite(yt)
    hts = jnp.where(okg & (ht > 0), ht, 1.0)
    g = jnp.where(okg, -0.5 * jnp.square((yt - s) / hts), 0.0)
    return jnp.where(ok, w, 0.0) - g


def _psi_kernel(n: int, m: int, N: int, dist: int, subs: int, nch: int,
                z_ref, phi_ref, obs_hbm, fac_hbm, eps_hbm, us_hbm,
                logw_ref, obs_buf, fac_buf, eps_buf, us_buf, dma_sem):
    """Fully-streamed psi-APF: per-step data stays in HBM and flows through
    double-buffered VMEM chunk buffers (_PSI_CHUNK steps per async DMA),
    with chunk c+1's copies in flight behind chunk c's compute.

    The proposal is the BACKWARD factorization of the smoothing law, so
    the dispatcher feeds TIME-REVERSED rows (step s generates state
    t = n - s; row 0 is the obs-free alpha_n draw).  The kernel itself is
    direction-agnostic: init from row 0, then resample/propagate/weight
    per row.

    HBM step-row layouts (step s == generation step):
      obs row s*6 + k:      [ytilde, Htilde, y, u, scales, D][k]
      fac row s*F + j:      [ahat (m), Lcond (mm), Acond (mm)], F = m+2mm
      eps row s*N*m + p*m + i, us row s*N + p (shifted: consumed AT s)
    The previous step's ahat is carried in registers across steps/chunks,
    so each step touches only its own rows."""
    mm = m * m
    Nm = N * m
    F = m + 2 * mm
    ch = _PSI_CHUNK
    blk = pl.program_id(0)
    Z = [z_ref[i] for i in range(m)]
    phi = phi_ref[0]
    inv_n = 1.0 / N
    tiny = 1e-35

    def mk_dma(hbm, buf, rpc, k):
        if subs == 1:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(c * rpc, rpc), pl.ds(blk * LANES, LANES)],
                    buf.at[slot], dma_sem.at[slot, k])
        else:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(c * rpc, rpc),
                           pl.ds(blk * subs, subs), :],
                    buf.at[slot], dma_sem.at[slot, k])
        return dma

    dmas = [mk_dma(obs_hbm, obs_buf, ch * 6, 0),
            mk_dma(fac_hbm, fac_buf, ch * F, 1),
            mk_dma(eps_hbm, eps_buf, ch * Nm, 2),
            mk_dma(us_hbm, us_buf, ch * N, 3)]

    def start_chunk(slot, c):
        for d in dmas:
            d(slot, c).start()

    def wait_chunk(slot, c):
        for d in dmas:
            d(slot, c).wait()

    start_chunk(0, 0)
    if nch > 1:
        start_chunk(1, 1)
    wait_chunk(0, 0)

    def signal(alpha_p, d_t):
        if dist == _SVM:
            return alpha_p[0]
        s = d_t
        for i in range(m):
            s = s + Z[i] * alpha_p[i]
        return s

    def lse(lws):
        mx = lws[0]
        for p in range(1, N):
            mx = jnp.maximum(mx, lws[p])
        mx_ok = jnp.isfinite(mx)
        mxs = jnp.where(mx_ok, mx, 0.0)
        ws = [jnp.where(jnp.isfinite(lws[p]),
                        jnp.exp(lws[p] - mxs), 0.0) for p in range(N)]
        sw = ws[0]
        for p in range(1, N):
            sw = sw + ws[p]
        ok2 = (sw > 0) & mx_ok
        sws = jnp.maximum(sw, tiny)
        inc = jnp.where(ok2, mxs + jnp.log(sws * inv_n), -jnp.inf)
        nw = [jnp.where(ok2, ws[p] / sws, inv_n) for p in range(N)]
        return inc, nw

    def weight_cols(slot, lt, alpha):
        yt = obs_buf[slot, lt * 6 + 0]
        ht = obs_buf[slot, lt * 6 + 1]
        y = obs_buf[slot, lt * 6 + 2]
        u = obs_buf[slot, lt * 6 + 3]
        sc = obs_buf[slot, lt * 6 + 4]
        d = obs_buf[slot, lt * 6 + 5]
        oky = jnp.isfinite(y)
        lws = [_lane_log_weight(dist, y, u, phi, signal(alpha[p], d), yt, ht)
               - sc for p in range(N)]
        lws = [jnp.where(oky, lws[p], 0.0) for p in range(N)]
        inc, nw = lse(lws)
        okf = oky.astype(inc.dtype)
        inc = okf * jnp.where(oky, inc, 0.0)
        nw = [jnp.where(oky, nw[p], inv_n) for p in range(N)]
        return inc, nw

    # t = 0: draw from N(ahat_0, L_0 L_0'); rows of chunk 0
    ah0 = [fac_buf[0, i] for i in range(m)]
    L0 = [fac_buf[0, m + ij] for ij in range(mm)]
    alpha = []
    for p in range(N):
        e = [eps_buf[0, p * m + j] for j in range(m)]
        a_p = []
        for i in range(m):
            s = ah0[i]
            for j in range(m):
                s = s + L0[i * m + j] * e[j]
            a_p.append(s)
        alpha.append(a_p)
    ll, nw = weight_cols(0, 0, alpha)

    def make_step(slot, base):
        def step(t, carry):
            """one psi step at time t; chunk-local row index t - base."""
            alpha, nw, ll, ah_prev = carry
            lt = t - base
            # stratified resampling as a one-hot contraction
            cum = []
            run = nw[0]
            for q in range(N):
                if q > 0:
                    run = run + nw[q]
                cum.append(run)
            one = jnp.ones_like(run)
            cum[N - 1] = one                       # cp[-1] := 1 exactly
            anc = [[jnp.zeros_like(run) for _ in range(m)]
                   for _ in range(N)]
            for p in range(N):
                r_p = us_buf[slot, lt * N + p]
                u_p = (p + r_p) * inv_n
                for q in range(N):
                    ge = cum[q] >= u_p
                    if q == 0:
                        h = ge
                    else:
                        h = ge & (cum[q - 1] < u_p)
                    hf = h.astype(run.dtype)
                    for i in range(m):
                        anc[p][i] = anc[p][i] + hf * alpha[q][i]
            # propagate through the conditional proposal
            ah_t = [fac_buf[slot, lt * F + i] for i in range(m)]
            L = [fac_buf[slot, lt * F + m + ij] for ij in range(mm)]
            A = [fac_buf[slot, lt * F + m + mm + ij] for ij in range(mm)]
            alpha_new = []
            for p in range(N):
                e = [eps_buf[slot, lt * Nm + p * m + j] for j in range(m)]
                a_p = []
                for i in range(m):
                    s = ah_t[i]
                    for j in range(m):
                        s = s + A[i * m + j] * (anc[p][j] - ah_prev[j]) \
                            + L[i * m + j] * e[j]
                    a_p.append(s)
                alpha_new.append(a_p)
            inc, nw_new = weight_cols(slot, lt, alpha_new)
            return alpha_new, nw_new, ll + inc, ah_t
        return step

    # backward generation: step 0 drew alpha_n (obs row 0 is a NaN pad, so
    # weight_cols contributed exactly 0); steps 1..n generate alpha_{n-1}
    # down to alpha_0 against the time-reversed rows.  Chunks are unrolled
    # in Python (static slots/bounds).
    carry = (alpha, nw, ll, ah0)
    for c in range(nch):
        slot = c % 2
        if c > 0:
            if c + 1 < nch:
                start_chunk((c + 1) % 2, c + 1)
            wait_chunk(slot, c)
        t_lo = 1 if c == 0 else c * ch
        t_hi = min((c + 1) * ch, n + 1)
        if t_lo < t_hi:
            carry = jax.lax.fori_loop(t_lo, t_hi, make_step(slot, c * ch),
                                      carry)
    logw_ref[0] = carry[2]


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "N", "dist", "subs",
                                    "interpret"))
def _fused_psi_call(yt, ht, y, u, sc, d, z, phi, ahat, lc, ac, eps, us, *,
                    n, m, N, dist, subs=1, interpret=False):
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    Nm = N * m
    ch = _PSI_CHUNK
    nch = -(-(n + 1) // ch)
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, subs, dt)

    # time-pad/trim the randomness to nch*ch step rows: eps row s holds the
    # proposal normals of step s; us is shifted so row s holds the
    # resampling uniforms consumed AT step s (s >= 1; row 0 unused)
    def pad_steps(x, per_step):
        x = x.reshape(Cn, -1, per_step)
        S = x.shape[1]
        if S < nch * ch:
            x = jnp.concatenate(
                [x, jnp.zeros((Cn, nch * ch - S, per_step), dt)], axis=1)
        else:
            x = x[:, :nch * ch]
        return x.reshape(Cn, nch * ch * per_step)

    F = m + 2 * mm
    # backward generation: step s holds the data of state t = n - s.
    # Step 0 (alpha_n) has no observation: a NaN/neutral pad row.
    obs = jnp.stack([yt, ht, y, u, sc, d], axis=2)          # (Cn, n, 6)
    nanv = jnp.full((Cn, 1), jnp.nan, dt)
    onev = jnp.ones((Cn, 1), dt)
    zerov = jnp.zeros((Cn, 1), dt)
    pad0 = jnp.stack([nanv, onev, nanv, onev, zerov, zerov],
                     axis=2)                                # (Cn, 1, 6)
    obs = jnp.concatenate([pad0, jnp.flip(obs, axis=1)], axis=1)
    fac = jnp.concatenate([ahat, lc.reshape(Cn, n + 1, mm),
                           ac.reshape(Cn, n + 1, mm)], axis=2)
    fac = jnp.flip(fac, axis=1)
    obs_p = pad_steps(obs.reshape(Cn, (n + 1) * 6), 6)
    fac_p = pad_steps(fac.reshape(Cn, (n + 1) * F), F)
    eps_p = pad_steps(eps.reshape(Cn, (n + 1) * Nm), Nm)
    us_sh = jnp.concatenate(
        [jnp.zeros((Cn, 1, N), dt), us.reshape(Cn, n, N)], axis=1)
    us_p = pad_steps(us_sh.reshape(Cn, (n + 1) * N), N)

    args = (lanes_last(z, m), lanes_last(phi, 1),
            lanes_last(obs_p, nch * ch * 6),
            lanes_last(fac_p, nch * ch * F),
            lanes_last(eps_p, nch * ch * Nm),
            lanes_last(us_p, nch * ch * N))
    grid = (Cn // (subs * LANES),)

    in_specs = [spec(m), spec(1)] + [pl.BlockSpec(memory_space=pl.ANY)] * 4

    def chunk_buf(rows_per_step):
        if subs == 1:
            return pltpu.VMEM((2, ch * rows_per_step, LANES), dt)
        return pltpu.VMEM((2, ch * rows_per_step, subs, LANES), dt)

    logw = pl.pallas_call(
        functools.partial(_psi_kernel, n, m, N, dist, subs, nch),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(1),
        out_shape=out_sd(1),
        scratch_shapes=[chunk_buf(6), chunk_buf(F), chunk_buf(Nm),
                        chunk_buf(N), pltpu.SemaphoreType.DMA((2, 4))],
        interpret=interpret,
    )(*args)
    return logw.reshape(Cn)


def fused_psi_logw_batched(spec, al, eps, us, axis_size, interpret=False):
    """Batched psi-APF log-weight via the fused factor + psi kernels.
    ``spec`` an NGSpec, ``al`` an ApproxLoglik, leaves possibly batched;
    eps (B, n+1, N, m), us (B, n, N).  Returns (B,) or None."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    N = eps.shape[-2]
    if not (_supported_psi(n, m, N) and _supported_rts(n, m)):
        return None
    if spec.distribution not in (_SVM, _POISSON, _BINOMIAL, _NEGBIN, _GAMMA):
        return None
    g = spec.approx_gaussian(al.approx.ytilde, al.approx.Htilde)
    fac = fused_smoother_bwd_factors_batched(g, axis_size,
                                             interpret=interpret)
    if fac is None:
        return None
    ahat, Lc, Ac = fac
    B = ahat.shape[0]
    dt = ahat.dtype

    def dense(x, core_ndim):
        x = jnp.asarray(x, dt)
        if x.ndim == core_ndim:
            x = jnp.broadcast_to(x, (B,) + x.shape)
        return x

    y = dense(spec.y, 1)
    u = dense(spec.u, 1)
    yt = dense(al.approx.ytilde, 1)
    ht = dense(al.approx.Htilde, 1)
    sc = dense(al.scales, 1)
    D = dense(spec.D, 1)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (B, n))
    Z = dense(spec.Z, 2)[:, 0]
    phi_arr = jnp.asarray(spec.phi, dt)
    if phi_arr.ndim == 0:                       # unbatched scalar
        phi = jnp.full((B, 1), phi_arr, dt)
    else:                                       # batched (B,) / (B, 1)
        phi = phi_arr.reshape(B, 1)
    eps = dense(eps, 3)
    us = dense(us, 2)
    sc_rows, io_rows = _psi_rows(n, m, N)
    subs = _pick_subs(sc_rows, io_rows, B, itemsize=y.dtype.itemsize)
    arrays = _pad_block([yt, ht, y, u, sc, D, Z, phi, ahat, Lc, Ac,
                         eps, us], B, subs)
    yt, ht, y, u, sc, D, Z, phi, ahat, Lc, Ac, eps, us = arrays
    logw = _fused_psi_call(yt, ht, y, u, sc, D, Z, phi, ahat, Lc, Ac,
                           eps, us, n=n, m=m, N=N,
                           dist=spec.distribution, subs=subs,
                           interpret=interpret)
    return logw[:B]


@jax.custom_batching.custom_vmap
def psi_logw_auto(spec, al, eps, us):
    """psi-APF log-weight with injected randomness; batched calls fuse the
    RTS-factor and psi kernels on TPU."""
    from ..inference.particle import psi_logw_scan
    return psi_logw_scan(spec, al, eps, us)


@psi_logw_auto.def_vmap
def _psi_logw_vmap(axis_size, in_batched, spec, al, eps, us):
    from ..core import config as _config
    from ..inference.particle import psi_logw_scan
    if _config.use_fused():
        out = fused_psi_logw_batched(spec, al, eps, us, axis_size,
                                     interpret=_interpret_mode())
        if out is not None:
            return out, True
        _fallback_notice("psi", n=spec.y.shape[-1], m=spec.a1.shape[-1],
                         N=eps.shape[-2])
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None,
                                  tuple(in_batched))
    out = jax.vmap(psi_logw_scan, in_axes=axes)(spec, al, eps, us)
    return out, True


@jax.custom_batching.custom_vmap
def smoother_bwd_factors_auto(spec):
    """(alphahat, Lb, Ab) — the backward factorization of the smoothing
    law, the psi-APF proposal factors (`ops.kalman.smoother_bwd_factors`);
    batched calls route through the fused RTS kernel when supported."""
    from . import kalman
    return kalman.smoother_bwd_factors(spec)


@smoother_bwd_factors_auto.def_vmap
def _smoother_bwd_factors_vmap(axis_size, in_batched, spec):
    from ..core import config as _config
    from . import kalman
    (spec_batched,) = in_batched
    if _config.use_fused():
        out = fused_smoother_bwd_factors_batched(spec, axis_size,
                                                 interpret=_interpret_mode())
        if out is not None:
            return out, (True, True, True)
        _fallback_notice("rts-factors", n=spec.y.shape[-1],
                         m=spec.a1.shape[-1])
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None, spec_batched)
    out = jax.vmap(kalman.smoother_bwd_factors, in_axes=(axes,))(spec)
    return out, (True, True, True)


@jax.custom_batching.custom_vmap
def fast_smoother_ll_auto(spec):
    """`ops.kalman.fast_smoother_ll` with a custom batching rule: under
    `vmap` (the many-chains / many-draws axes of the MCMC engines) the whole
    batch is routed through the fused chains-in-lanes kernel instead of a
    batched `lax.scan`.  Unbatched calls and unsupported shapes fall back to
    the scan implementation unchanged."""
    from . import kalman
    return kalman.fast_smoother_ll(spec)


@fast_smoother_ll_auto.def_vmap
def _fast_smoother_ll_vmap(axis_size, in_batched, spec):
    from ..core import config as _config
    from . import kalman
    (spec_batched,) = in_batched
    if _config.use_fused():
        out = fused_fast_smoother_ll_batched(spec, axis_size,
                                             interpret=_interpret_mode())
        if out is not None:
            return out, (True, True)
        _fallback_notice("fast-smoother", n=spec.y.shape[-1],
                         m=spec.a1.shape[-1])
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None, spec_batched)
    out = jax.vmap(kalman.fast_smoother_ll, in_axes=(axes,))(spec)
    return out, (True, True)


def fused_fast_smoother_ll_batched(spec, axis_size, interpret=False):
    """Batched fast_smoother_ll via the fused kernel.  ``spec`` is an LGSpec
    whose leaves may carry a leading batch axis of ``axis_size``.
    Returns (alpha (B, n+1, m), ll (B,)) or None if unsupported."""
    prep = _batched_inputs(spec, axis_size)
    if prep is None:
        return None
    y, h2, d, z, t, rr, a1, p1, c, n, m = prep
    B = y.shape[0]
    sc_rows, io_rows = _kf_rows(n, m)
    subs = _pick_subs(sc_rows, io_rows + (n + 1) * m, B,
                      itemsize=y.dtype.itemsize)
    y, h2, d, z, t, rr, a1, p1, c = _pad_block(
        (y, h2, d, z, t, rr, a1, p1, c), B, subs)
    alpha, ll = _fused_call(y, h2, d, z, t, rr, a1, p1, c, n=n, m=m,
                            subs=subs, interpret=interpret)
    alpha, ll = alpha[:B], ll[:B]
    # degenerate-model guard (matches ops/kalman.log_likelihood)
    degenerate = (jnp.sum(h2[:B], axis=-1)
                  + jnp.sum(jnp.abs(rr[:B]), axis=(-1, -2))) < ZERO_TOL
    ll = jnp.where(degenerate, -jnp.inf, ll)
    return alpha, ll


# ---------------------------------------------------------------------------
# fused LARGE-N psi-APF kernel (particles in sublanes)
# ---------------------------------------------------------------------------
# The small-N kernel above unrolls the particle ensemble into registers,
# which caps N at 32.  The reference's own benchmark grid runs bootstrap
# filters with 200 particles and BASELINE.json's headline metric is
# psi-APF at N=256 (`/root/reference/benchmarks/replications.Rmd:27-78`),
# so large N is a first-class regime.  This kernel re-lays the problem:
#
# - IS-correction draws stay in the 128 LANES (matching the factor-kernel
#   pipeline layout), the N-particle ensemble maps onto SUBLANES as
#   (N, 128) tiles — every elementwise op is N/8 full vregs;
# - stratified resampling is a one-hot contraction built from a single
#   broadcast compare per output particle: with Ge[p, q] = 1{cum_q >= u_p}
#   and the telescoping identity sum_q H[p,q] a_q = sum_q Ge[p,q] (a_q -
#   a_{q+1}), selection costs one (N, 128) compare + m multiply-reduces
#   per output particle (no gather, no (N, N, B) one-hot materialised);
#   the weight prefix-sum rides the MXU (lower-triangular ones matmul);
# - randomness is generated IN-KERNEL (pltpu.prng_random_bits + Box-
#   Muller), eliminating the (n, N, m)-normals HBM stream that dominates
#   the large-N scan tier (~315 KB per draw per correction);
# - `kk` (resample period) statically skips the selection pass on all but
#   every kk-th step: the psi-APF's near-flat weights keep within-filter
#   ESS high between resamplings (standard adaptive-SMC practice; the
#   estimator stays unbiased for any fixed schedule), trading a documented
#   ESS_IS check for the dominant cost.  kk=1 reproduces the reference's
#   every-step stratified semantics (`/root/reference/src/
#   model_ssm_ung.cpp:511-609`).
#
# `stream=True` replaces the in-kernel PRNG with injected eps/us tensors
# (interpret-testable on CPU; pltpu.prng_* has no CPU lowering) — the two
# modes share every other code path, so CPU tests pin the selection /
# propagation / weight math and the TPU zoo run validates the PRNG tier
# statistically.

_MAX_N_PSI_BIG = 512


def _psi_big_rows(n: int, m: int, N: int):
    F = m + 2 * m * m
    io = (n + 1) * (6 + F) + m + 1
    scratch = (m + 1) * N
    return scratch, io


def _supported_psi_big(n: int, m: int, N: int) -> bool:
    sc, io = _psi_big_rows(n, m, N)
    # io double-buffered by the grid pipeline; ~6N rows of live (N, 128)
    # values (alpha, dalpha, cum, u, weights) on top of the scratch refs
    return (m <= _MAX_M_RTS and _MAX_N_PSI < N <= _MAX_N_PSI_BIG
            and N % 8 == 0
            and (2 * io + sc + 6 * N) * LANES * 4 < _VMEM_LIMIT_BYTES)


def _psi_big_kernel(n: int, m: int, N: int, dist: int, kk: int,
                    stream: bool, bsf: bool, z_ref, phi_ref, obs_ref,
                    fac_ref, seed_ref, eps_ref, us_ref, logw_ref, anc_ref,
                    u_ref):
    """Large-N psi-APF / BSF log-weight; one grid block = 128 draws x N
    particles.

    psi mode — row layouts match `_psi_kernel` (generation order, step s
    holds state t = n - s; obs row 0 is the NaN pad for the obs-free
    alpha_n draw):
      obs row s*6 + k:  [ytilde, Htilde, y, u, scales, D][k]
      fac row s*F + j:  [ahat (m), Lcond (mm), Acond (mm)], F = m + 2mm

    bsf=True reuses the identical machinery for the bootstrap filter
    (`/root/reference/src/model_ssm_ung.cpp:611-712`): rows run FORWARD
    in time (n := number of obs - 1); obs rows carry [NaN, 1, y, u, 0, D]
    so `_lane_log_weight` reduces to the plain observation density;
    fac row 0 = [a1, chol(P1), 0] and rows s >= 1 = [C, R, T]; the
    carried ah_prev is pinned to 0 so the propagation
    ah + A(anc - 0) + L eps IS C + T anc + R eps; the initial ensemble is
    weighted against obs row 0 (the reference weights y_0 before any
    resampling).

    stream mode:  eps row s*N*m + j*N + p;  us row s*N + p (row block 0
    unused — uniforms are consumed at the step that resamples).
    """
    f32 = jnp.float32
    mm = m * m
    F = m + 2 * mm
    Nm = N * m
    tiny = 1e-35
    neglogN = float(-np.log(N))

    if not stream:
        # Mosaic caps prng_seed at 2 values: fold the grid block id into
        # the second word (Knuth multiplicative hash) so blocks decorrelate
        blk_mix = seed_ref[1] ^ (pl.program_id(0) * np.int32(-1640531527))
        pltpu.prng_seed(seed_ref[0], blk_mix)

    phi = phi_ref[pl.ds(0, 1), :]
    zrow = [z_ref[pl.ds(i, 1), :] for i in range(m)]
    # Mosaic iota must be integer-typed; convert after
    rio_i = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)
    rio = rio_i.astype(f32)
    last_row = rio_i == (N - 1)
    Ulow = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)).astype(f32)

    def rand_u01(shape):
        # prng_random_bits returns int32 on TPU: bitcast to uint32 so the
        # shift is logical (negative bits gave u < 0), then back to int32
        # (fits in 24 bits) because Mosaic lacks a uint32->f32 cast
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b24 = pltpu.bitcast(bits >> 8, jnp.int32)
        return (b24.astype(f32) + 0.5) * (1.0 / (1 << 24))

    def draw_normals(s):
        if stream:
            return [eps_ref[pl.ds(s * Nm + j * N, N), :] for j in range(m)]
        out = []
        for _ in range((m + 1) // 2):
            u1 = rand_u01((N, LANES))
            u2 = rand_u01((N, LANES))
            rad = jnp.sqrt(-2.0 * jnp.log(u1))
            ang = (2.0 * np.pi) * u2
            out.append(rad * jnp.cos(ang))
            out.append(rad * jnp.sin(ang))
        return out[:m]

    def draw_uniforms(s):
        if stream:
            return us_ref[pl.ds(s * N, N), :]
        return rand_u01((N, LANES))

    def propagate(s, anc, ahp):
        eps = draw_normals(s)
        base = s * F
        ah_t = [fac_ref[pl.ds(base + i, 1), :] for i in range(m)]
        Lr = [fac_ref[pl.ds(base + m + ij, 1), :] for ij in range(mm)]
        Ar = [fac_ref[pl.ds(base + m + mm + ij, 1), :] for ij in range(mm)]
        alpha_new = []
        for i in range(m):
            acc = ah_t[i]
            for j in range(m):
                acc = acc + Ar[i * m + j] * (anc[j] - ahp[j]) \
                    + Lr[i * m + j] * eps[j]
            alpha_new.append(acc)
        return tuple(alpha_new), tuple(ah_t)

    def weight(s, alpha, lnw, ll):
        ob = s * 6
        yt = obs_ref[pl.ds(ob + 0, 1), :]
        ht = obs_ref[pl.ds(ob + 1, 1), :]
        y = obs_ref[pl.ds(ob + 2, 1), :]
        uu = obs_ref[pl.ds(ob + 3, 1), :]
        sc = obs_ref[pl.ds(ob + 4, 1), :]
        dd = obs_ref[pl.ds(ob + 5, 1), :]
        if dist == _SVM:
            sig = alpha[0]
        else:
            sig = dd
            for i in range(m):
                sig = sig + zrow[i] * alpha[i]
        lw = _lane_log_weight(dist, y, uu, phi, sig, yt, ht) - sc
        oky = jnp.isfinite(y)
        lw = jnp.where(oky, lw, 0.0)
        lt = lnw + lw
        lt = jnp.where(jnp.isfinite(lt), lt, -jnp.inf)
        mx = jnp.max(lt, axis=0, keepdims=True)
        mx_ok = jnp.isfinite(mx)
        mxs = jnp.where(mx_ok, mx, 0.0)
        w = jnp.where(jnp.isfinite(lt), jnp.exp(lt - mxs), 0.0)
        sw = jnp.sum(w, axis=0, keepdims=True)
        ok2 = (sw > 0) & mx_ok
        inc = jnp.where(ok2, mxs + jnp.log(jnp.maximum(sw, tiny)),
                        -jnp.inf)
        ll = ll + jnp.where(oky, inc, 0.0)
        lnw_new = jnp.where(ok2, lt - inc, neglogN)
        return lnw_new, ll

    def resample(s0, alpha, lnw):
        nw = jnp.where(jnp.isfinite(lnw), jnp.exp(lnw), 0.0)
        cum = jax.lax.dot_general(Ulow, nw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        cum = jnp.where(last_row, 1.0, cum)
        r = draw_uniforms(s0)
        u_ref[...] = (rio + r) * (1.0 / N)
        dal = []
        for i in range(m):
            rolled = pltpu.roll(alpha[i], N - 1, 0)     # shift-up by one
            dal.append(alpha[i] - jnp.where(last_row, 0.0, rolled))

        # 8 output particles per iteration: amortizes loop/address
        # overhead 8x and writes full (8, 128) tiles (measured ~2x on the
        # true kernel time vs one-p-per-iteration); N % 8 == 0 guaranteed
        # by _supported_psi_big
        def pbody(pb, tok):
            up = u_ref[pl.ds(pb * 8, 8), :]
            for i in range(m):
                rows = [jnp.sum((cum >= up[so:so + 1]).astype(f32)
                                * dal[i], axis=0, keepdims=True)
                        for so in range(8)]
                anc_ref[pl.ds(i * N + pb * 8, 8), :] = jnp.concatenate(
                    rows, axis=0)
            return tok

        jax.lax.fori_loop(0, N // 8, pbody, 0)
        return tuple(anc_ref[pl.ds(i * N, N), :] for i in range(m))

    # step 0: draw the initial ensemble — psi: alpha_n ~ N(ahat_n, L L')
    # with no observation; bsf: alpha_0 ~ N(a1, P1) weighted against y_0
    eps0 = draw_normals(0)
    ah0 = [fac_ref[pl.ds(i, 1), :] for i in range(m)]
    L0 = [fac_ref[pl.ds(m + ij, 1), :] for ij in range(mm)]
    alpha = []
    for i in range(m):
        acc = ah0[i]
        for j in range(m):
            acc = acc + L0[i * m + j] * eps0[j]
        alpha.append(acc)
    lnw0 = jnp.full((N, LANES), neglogN, f32)
    ll0 = jnp.zeros((1, LANES), f32)
    if bsf:
        lnw0, ll0 = weight(0, tuple(alpha), lnw0, ll0)
        ahp0 = tuple(jnp.zeros((1, LANES), f32) for _ in range(m))
    else:
        ahp0 = tuple(ah0)

    nseg = -(-n // kk)

    def seg_body(seg, carry):
        alpha, lnw, ll, ahp = carry
        s0 = 1 + seg * kk
        anc = resample(s0, alpha, lnw)
        alpha, aht = propagate(s0, anc, ahp)
        if bsf:
            aht = ahp                    # stays the zero tuple
        lnw, ll = weight(s0, alpha, jnp.full((N, LANES), neglogN, f32), ll)

        def inner(s, c):
            al_, lnw_, ll_, ahp_ = c
            al2, aht2 = propagate(s, al_, ahp_)
            if bsf:
                aht2 = ahp_
            lnw2, ll2 = weight(s, al2, lnw_, ll_)
            return (al2, lnw2, ll2, aht2)

        hi = jnp.minimum(s0 + kk, n + 1)
        return jax.lax.fori_loop(s0 + 1, hi, inner, (alpha, lnw, ll, aht))

    carry = jax.lax.fori_loop(0, nseg, seg_body,
                              (tuple(alpha), lnw0, ll0, ahp0))
    logw_ref[...] = carry[2]


@functools.partial(jax.jit, static_argnames=("n", "m", "N", "dist", "kk",
                                             "stream", "interpret"))
def _fused_psi_big_call(yt, ht, y, u, sc, d, z, phi, ahat, lc, ac, seeds,
                        eps, us, *, n, m, N, dist, kk, stream=False,
                        interpret=False):
    """Dispatch the large-N psi kernel.  Chain-batched inputs as in
    `_fused_psi_call`; seeds (2,) int32 (ignored in stream mode); stream
    mode takes eps (Cn, n+1, m, N) and us (Cn, n+1, N)."""
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    F = m + 2 * mm
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, 1, dt)

    obs = jnp.stack([yt, ht, y, u, sc, d], axis=2)          # (Cn, n, 6)
    nanv = jnp.full((Cn, 1), jnp.nan, dt)
    onev = jnp.ones((Cn, 1), dt)
    zerov = jnp.zeros((Cn, 1), dt)
    pad0 = jnp.stack([nanv, onev, nanv, onev, zerov, zerov], axis=2)
    obs = jnp.concatenate([pad0, jnp.flip(obs, axis=1)], axis=1)
    fac = jnp.concatenate([ahat, lc.reshape(Cn, n + 1, mm),
                           ac.reshape(Cn, n + 1, mm)], axis=2)
    fac = jnp.flip(fac, axis=1)

    if stream:
        eps_rows = lanes_last(eps.reshape(Cn, (n + 1) * N * m),
                              (n + 1) * N * m)
        us_rows = lanes_last(us.reshape(Cn, (n + 1) * N), (n + 1) * N)
        eps_spec, us_spec = spec((n + 1) * N * m), spec((n + 1) * N)
    else:
        eps_rows = jnp.zeros((8, Cn), dt)
        us_rows = jnp.zeros((8, Cn), dt)
        eps_spec, us_spec = spec(8), spec(8)

    args = (lanes_last(z, m), lanes_last(phi, 1),
            lanes_last(obs.reshape(Cn, (n + 1) * 6), (n + 1) * 6),
            lanes_last(fac.reshape(Cn, (n + 1) * F), (n + 1) * F),
            seeds, eps_rows, us_rows)
    grid = (Cn // LANES,)
    in_specs = [spec(m), spec(1), spec((n + 1) * 6), spec((n + 1) * F),
                pl.BlockSpec(memory_space=pltpu.SMEM), eps_spec, us_spec]
    logw = pl.pallas_call(
        functools.partial(_psi_big_kernel, n, m, N, dist, kk, stream,
                          False),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(1),
        out_shape=out_sd(1),
        scratch_shapes=[scratch_t(m * N), scratch_t(N)],
        interpret=interpret,
    )(*args)
    return logw.reshape(Cn)


def _psi_big_prep(spec, al, axis_size, interpret):
    """Shared batched-input prep: factors via the fused RTS kernel plus
    dense chain-batched obs arrays; None if unsupported."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if spec.distribution not in (_SVM, _POISSON, _BINOMIAL, _NEGBIN,
                                 _GAMMA):
        return None
    g = spec.approx_gaussian(al.approx.ytilde, al.approx.Htilde)
    fac = fused_smoother_bwd_factors_batched(g, axis_size,
                                             interpret=interpret)
    if fac is None:
        return None
    ahat, Lc, Ac = fac
    B = ahat.shape[0]
    dt = ahat.dtype

    def dense(x, core_ndim):
        x = jnp.asarray(x, dt)
        if x.ndim == core_ndim:
            x = jnp.broadcast_to(x, (B,) + x.shape)
        return x

    y = dense(spec.y, 1)
    u = dense(spec.u, 1)
    yt = dense(al.approx.ytilde, 1)
    ht = dense(al.approx.Htilde, 1)
    sc = dense(al.scales, 1)
    D = dense(spec.D, 1)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (B, n))
    Z = dense(spec.Z, 2)[:, 0]
    phi_arr = jnp.asarray(spec.phi, dt)
    if phi_arr.ndim == 0:
        phi = jnp.full((B, 1), phi_arr, dt)
    else:
        phi = phi_arr.reshape(B, 1)
    return (yt, ht, y, u, sc, D, Z, phi, ahat, Lc, Ac), B, n, m


def fused_psi_big_batched(spec, al, seeds, nsim, kk, axis_size,
                          interpret=False):
    """Batched large-N psi-APF log-weight with in-kernel PRNG, or None.
    ``seeds``: (B, 2) or (2,) uint32 raw key data; one base seed per call
    (blocks and chunks decorrelate via program_id / differing keys)."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported_psi_big(n, m, nsim):
        return None
    prep = _psi_big_prep(spec, al, axis_size, interpret)
    if prep is None:
        return None
    arrays, B, n, m = prep
    seed_row = seeds[0] if seeds.ndim > 1 else seeds
    seed2 = jax.lax.bitcast_convert_type(seed_row, jnp.int32)
    arrays = _pad_block(list(arrays), B, 1)
    zero = jnp.zeros((1,), arrays[0].dtype)
    logw = _fused_psi_big_call(*arrays, seed2, zero, zero, n=n, m=m,
                               N=nsim, dist=spec.distribution, kk=kk,
                               stream=False, interpret=interpret)
    return logw[:B]


def psi_big_logw_stream(spec, al, eps, us, kk, interpret=True):
    """Stream-mode (injected randomness) large-N psi log-weight for
    parity testing: eps (B, n+1, m, N), us (B, n+1, N) (row block 0
    unused).  Returns (B,) log psi-weights (excluding al.loglik)."""
    B = eps.shape[0]
    N = eps.shape[-1]
    prep = _psi_big_prep(spec, al, B, interpret)
    if prep is None:
        return None
    arrays, B2, n, m = prep
    assert B2 == B
    arrays = _pad_block(list(arrays) + [eps, us], B, 1)
    eps_p, us_p = arrays[-2], arrays[-1]
    seed2 = jnp.zeros((2,), jnp.int32)
    logw = _fused_psi_big_call(*arrays[:-2], seed2, eps_p, us_p, n=n, m=m,
                               N=N, dist=spec.distribution, kk=kk,
                               stream=True, interpret=interpret)
    return logw[:B]


@functools.lru_cache(maxsize=None)
def _psi_big_auto(nsim: int, kk: int):
    """custom_vmap dispatcher for the large-N tier, one instance per
    (particle count, resample period)."""

    @jax.custom_batching.custom_vmap
    def psi_big(spec, al, seeds):
        from ..inference.particle import _psi_logw_keyed
        return _psi_logw_keyed(spec, al, nsim, seeds, resample_every=kk)

    @psi_big.def_vmap
    def _vmap(axis_size, in_batched, spec, al, seeds):
        from ..core import config as _config
        from ..inference.particle import _psi_logw_keyed
        # the PRNG tier is TPU-only: pltpu.prng_* has no CPU/interpret
        # lowering (the stream variant covers CPU testing)
        if _config.use_fused() and not _interpret_mode():
            out = fused_psi_big_batched(spec, al, seeds, nsim, kk,
                                        axis_size, interpret=False)
            if out is not None:
                return out, True
            _fallback_notice("psi-big", n=spec.y.shape[-1],
                             m=spec.a1.shape[-1], N=nsim)
        axes = jax.tree_util.tree_map(lambda b: 0 if b else None,
                                      tuple(in_batched))
        out = jax.vmap(lambda s, a, k: _psi_logw_keyed(
            s, a, nsim, k, resample_every=kk),
            in_axes=axes)(spec, al, seeds)
        return out, True

    return psi_big


# ---------------------------------------------------------------------------
# large-N bootstrap-filter tier (shares _psi_big_kernel via bsf=True)
# ---------------------------------------------------------------------------
# The reference's Table-1 grid runs the bootstrap filter with 200
# particles (`/root/reference/benchmarks/replications.Rmd:27-78`) — the
# pm/da-bsf and is-bsf paths previously fell to the scan tier above
# N = 32.  Same layout and machinery as the psi tier; only the row
# CONTENT differs (see the kernel docstring).

@functools.partial(jax.jit, static_argnames=("n_obs", "m", "N", "dist",
                                             "kk", "stream", "interpret"))
def _fused_bsf_big_call(y, u, d, z, phi, a1, L1, Cv, Rm, Tm, seeds,
                        eps, us, *, n_obs, m, N, dist, kk, stream=False,
                        interpret=False):
    """Dispatch the large-N BSF kernel.  y/u/d (Cn, n_obs); z (Cn, m);
    a1 (Cn, m); L1 = chol(P1) (Cn, m, m); Cv (Cn, m); Rm/Tm (Cn, m, m)
    (R zero-padded to m columns).  Steps = n_obs, forward time order."""
    Cn = y.shape[0]
    dt = y.dtype
    mm = m * m
    F = m + 2 * mm
    n = n_obs - 1                      # kernel steps after the initial draw
    lanes_last, spec, out_sd, unpack, scratch_t = _tiles(Cn, 1, dt)

    nanc = jnp.full((Cn, n_obs), jnp.nan, dt)
    onec = jnp.ones((Cn, n_obs), dt)
    zeroc = jnp.zeros((Cn, n_obs), dt)
    obs = jnp.stack([nanc, onec, y, u, zeroc, d], axis=2)   # (Cn, n_obs, 6)
    fac0 = jnp.concatenate([a1, L1.reshape(Cn, mm),
                            jnp.zeros((Cn, mm), dt)], axis=1)[:, None]
    fac_s = jnp.concatenate([Cv, Rm.reshape(Cn, mm),
                             Tm.reshape(Cn, mm)], axis=1)[:, None]
    fac = jnp.concatenate([fac0, jnp.broadcast_to(
        fac_s, (Cn, n_obs - 1, F))], axis=1)                # (Cn, n_obs, F)

    if stream:
        eps_rows = lanes_last(eps.reshape(Cn, n_obs * N * m),
                              n_obs * N * m)
        us_rows = lanes_last(us.reshape(Cn, n_obs * N), n_obs * N)
        eps_spec, us_spec = spec(n_obs * N * m), spec(n_obs * N)
    else:
        eps_rows = jnp.zeros((8, Cn), dt)
        us_rows = jnp.zeros((8, Cn), dt)
        eps_spec, us_spec = spec(8), spec(8)

    args = (lanes_last(z, m), lanes_last(phi, 1),
            lanes_last(obs.reshape(Cn, n_obs * 6), n_obs * 6),
            lanes_last(fac.reshape(Cn, n_obs * F), n_obs * F),
            seeds, eps_rows, us_rows)
    grid = (Cn // LANES,)
    in_specs = [spec(m), spec(1), spec(n_obs * 6), spec(n_obs * F),
                pl.BlockSpec(memory_space=pltpu.SMEM), eps_spec, us_spec]
    logw = pl.pallas_call(
        functools.partial(_psi_big_kernel, n, m, N, dist, kk, stream,
                          True),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(1),
        out_shape=out_sd(1),
        scratch_shapes=[scratch_t(m * N), scratch_t(N)],
        interpret=interpret,
    )(*args)
    return logw.reshape(Cn)


def _bsf_big_prep(spec, axis_size):
    """Dense chain-batched BSF system arrays, or None if unsupported
    (time-varying system, m > 4, non-univariate family)."""
    from ..ops.chol import psd_chol
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if spec.distribution not in (_SVM, _POISSON, _BINOMIAL, _NEGBIN,
                                 _GAMMA):
        return None
    if (spec.Z.shape[-2] != 1 or spec.T.shape[-3] != 1
            or spec.R.shape[-3] != 1 or spec.C.shape[-2] != 1):
        return None
    batched = spec.y.ndim == 2
    B = spec.y.shape[0] if batched else axis_size
    dt = spec.y.dtype

    def dense(x, core_ndim):
        x = jnp.asarray(x, dt)
        if x.ndim == core_ndim:
            x = jnp.broadcast_to(x, (B,) + x.shape)
        return x

    y = dense(spec.y, 1)
    u = dense(spec.u, 1)
    D = dense(spec.D, 1)
    if D.shape[-1] == 1:
        D = jnp.broadcast_to(D, (B, n))
    Z = dense(spec.Z, 2)[:, 0]
    a1 = dense(spec.a1, 1)
    P1 = dense(spec.P1, 2)
    L1 = jax.vmap(psd_chol)(P1)
    Cv = dense(spec.C, 2)[:, 0]
    T = dense(spec.T, 3)[:, 0]
    R = dense(spec.R, 3)[:, 0]
    k = R.shape[-1]
    if k < m:
        R = jnp.concatenate([R, jnp.zeros((B, m, m - k), dt)], axis=-1)
    elif k > m:
        return None
    phi_arr = jnp.asarray(spec.phi, dt)
    if phi_arr.ndim == 0:
        phi = jnp.full((B, 1), phi_arr, dt)
    else:
        phi = phi_arr.reshape(B, 1)
    return (y, u, D, Z, phi, a1, L1, Cv, R, T), B, n, m


def fused_bsf_big_batched(spec, seeds, nsim, kk, axis_size,
                          interpret=False):
    """Batched large-N BSF log-likelihood (minus the observation
    constants, added by the caller) with in-kernel PRNG, or None."""
    n = spec.y.shape[-1]
    m = spec.a1.shape[-1]
    if not _supported_psi_big(n - 1, m, nsim):
        return None
    prep = _bsf_big_prep(spec, axis_size)
    if prep is None:
        return None
    arrays, B, n, m = prep
    seed_row = seeds[0] if seeds.ndim > 1 else seeds
    seed2 = jax.lax.bitcast_convert_type(seed_row, jnp.int32)
    arrays = _pad_block(list(arrays), B, 1)
    zero = jnp.zeros((1,), arrays[0].dtype)
    logw = _fused_bsf_big_call(*arrays, seed2, zero, zero, n_obs=n, m=m,
                               N=nsim, dist=spec.distribution, kk=kk,
                               stream=False, interpret=interpret)
    return logw[:B]


def bsf_big_logw_stream(spec, eps, us, kk, interpret=True):
    """Stream-mode (injected randomness) large-N BSF log-likelihood for
    parity testing: eps (B, n, m, N), us (B, n, N) (row block 0 unused).
    Excludes the observation constants."""
    B = eps.shape[0]
    N = eps.shape[-1]
    prep = _bsf_big_prep(spec, B)
    if prep is None:
        return None
    arrays, B2, n, m = prep
    assert B2 == B
    arrays = _pad_block(list(arrays) + [eps, us], B, 1)
    eps_p, us_p = arrays[-2], arrays[-1]
    seed2 = jnp.zeros((2,), jnp.int32)
    logw = _fused_bsf_big_call(*arrays[:-2], seed2, eps_p, us_p, n_obs=n,
                               m=m, N=N, dist=spec.distribution, kk=kk,
                               stream=True, interpret=interpret)
    return logw[:B]


@functools.lru_cache(maxsize=None)
def _bsf_big_auto(nsim: int, kk: int):
    """custom_vmap dispatcher for the large-N BSF tier."""

    @jax.custom_batching.custom_vmap
    def bsf_big(spec, seeds):
        from ..inference.particle import _bsf_logw_keyed
        return _bsf_logw_keyed(spec, nsim, seeds, resample_every=kk)

    @bsf_big.def_vmap
    def _vmap(axis_size, in_batched, spec, seeds):
        from ..core import config as _config
        from ..inference.particle import _bsf_logw_keyed
        if _config.use_fused() and not _interpret_mode():
            out = fused_bsf_big_batched(spec, seeds, nsim, kk, axis_size,
                                        interpret=False)
            if out is not None:
                return out, True
            _fallback_notice("bsf-big", n=spec.y.shape[-1],
                             m=spec.a1.shape[-1], N=nsim)
        axes = jax.tree_util.tree_map(lambda b: 0 if b else None,
                                      tuple(in_batched))
        out = jax.vmap(lambda s, k: _bsf_logw_keyed(
            s, nsim, k, resample_every=kk), in_axes=axes)(spec, seeds)
        return out, True

    return bsf_big
