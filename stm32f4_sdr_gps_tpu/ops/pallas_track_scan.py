"""EXPERIMENTAL: the whole tracking scan inside one Pallas kernel.

The production path runs the per-epoch step under ``lax.scan``
(track.scan.track_block), launching one fused E/P/L kernel per epoch.
This kernel moves the *entire* loop — code NCO, carrier wipe-off, E/P/L
correlation, DLL/Costas-PLL/FLL and bit sync (tracking.c:92-393 +
nav_data.c:46-138 equivalents) — into a single ``pallas_call`` with
``grid=(T,)``:

* the epoch stream is auto-DMA'd HBM→VMEM by the Pallas pipeline
  (BlockSpec index_map over the grid) — compute overlaps the fetch of
  the next epoch, which the scan-of-kernels structure cannot do;
* per-channel loop state lives in SMEM scratch, persisting across grid
  steps (TPU grid steps execute sequentially on a core);
* per-epoch observables stream out through an SMEM-blocked output;
  the final state is copied out on the last grid step.

v1 is correctness-first: channels advance via an in-kernel
``fori_loop`` with scalar state math (vectorizing state across the
channel axis needs VMEM↔SMEM staging — round-2 work, docs/ROADMAP.md
§2).  Deliberate scope cuts vs track_epoch_step, documented here so the
diff is auditable:

* no SNR estimator (tracking.c:147-169) — the receiver computes C/N0
  host-side anyway (runtime.receiver._m2m4_cn0);
* the false-lock watchdog IS in-kernel (4-epoch sign window +
  counters), but its kick-target jitter uses a simplified integer LCG,
  so a kicked channel's exact Doppler differs from the production
  scan (both are random kicks around the acquisition Doppler);
  pll_check_window must be 4 (the compiled ring size);
* all channels share one global epoch counter (``start_epoch + t``);
  the production state carries per-channel ``epoch_idx``, which only
  diverges after a late-rise concat;
* bit decisions are majority-vote only (``cfg.coherent_bit_vote`` is
  not implemented in-kernel yet).

Validated against track_block in interpreter mode
(tests/test_pallas_scan.py, including exact integer bit-sync
agreement); compiles and executes natively on a TPU v5e (Mosaic notes:
SMEM output blocks obey the same (8, 128) sublane tiling rule as VMEM,
hence the 8-epoch-row output blocking; atan2 has no Mosaic lowering,
hence the polynomial Costas discriminator).  The TPU wall-clock
comparison vs the scan-of-kernels path is round-2 work — it needs the
honest-timing environment first (docs/SCALING.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CODE_LENGTH, FREQ_L1_HZ, SignalPlan, TrackConfig
from .pallas_epl import S, SP, U2P

# SMEM per-channel state rows (f32 / i32 planes)
_F32_FIELDS = (
    "code_phase", "doppler", "carrier_phase",
    "dll_prev", "pll_prev", "fll_theta", "fll_err", "acq_doppler",
)
_I32_FIELDS = (
    "fll_primed", "prev_sign", "last_swap", "rpc", "sync",
    "old_rem", "pos_cnt", "neg_cnt",
    # false-lock watchdog (tracking.c:261-327): sign window ring
    # (oldest..newest, pll_check_window=4 assumed) + counters
    "w0", "w1", "w2", "w3", "bad_cnt", "master_cnt",
)
NF32 = len(_F32_FIELDS)
NI32 = len(_I32_FIELDS)
# per-epoch output slots (per channel):
# 0 ip, 1 qp, 2 code_phase (epoch start), 3 doppler (updated),
# 4 bit_ready, 5 bit_value, 6 bit_epoch, 7 period_sync_ok
NOUT = 8


def _kernel(cfg: TrackConfig, plan: SignalPlan, n_chan: int, t_cnt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = plan.sample_rate_hz
    cps = float(plan.chips_per_sample)
    cib = cfg.codes_in_bit
    two_pi = float(2.0 * np.pi)

    def costas_err(ip, qp):
        """atan2(qp*sign(ip), |ip|)/pi without atan2 (no Mosaic
        lowering): octant fold + 9th-order polynomial, ~1e-5 rad —
        far below the correlator noise floor."""
        y = qp * jnp.sign(ip)
        ax = jnp.abs(ip)
        ay = jnp.abs(y)
        z = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
        z2 = z * z
        p = jnp.float32(0.0208351)
        p = p * z2 - 0.0851330
        p = p * z2 + 0.1801410
        p = p * z2 - 0.3302995
        p = p * z2 + 0.9998660
        a = z * p
        a = jnp.where(ay > ax, np.pi / 2 - a, a)
        return jnp.sign(y) * a / np.pi

    def kernel(f32_init, i32_init, start_ref, x_ref, u2_ref,
               out_ref, f32_out, i32_out, f32_st, i32_st):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _load_state():
            for i in range(NF32):
                for c in range(n_chan):
                    f32_st[i, c] = f32_init[i, c]
            for i in range(NI32):
                for c in range(n_chan):
                    i32_st[i, c] = i32_init[i, c]

        epoch = start_ref[0, 0] + t
        k = jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1).astype(
            jnp.float32)
        xr = x_ref[0, 0:1, :]
        xi = x_ref[0, 1:2, :]

        def channel_body(c, _):
            cp = f32_st[0, c]
            dop = f32_st[1, c]
            ph = f32_st[2, c]
            dll_prev = f32_st[3, c]
            pll_prev = f32_st[4, c]
            fll_theta = f32_st[5, c]
            fll_err = f32_st[6, c]
            fll_primed = i32_st[0, c]
            prev_sign = i32_st[1, c]
            last_swap = i32_st[2, c]
            rpc = i32_st[3, c]
            sync = i32_st[4, c]
            old_rem = i32_st[5, c]
            pos_cnt = i32_st[6, c]
            neg_cnt = i32_st[7, c]
            w0 = i32_st[8, c]
            w1 = i32_st[9, c]
            w2 = i32_st[10, c]
            w3 = i32_st[11, c]
            bad_cnt = i32_st[12, c]
            master = i32_st[13, c]
            acq_dop = f32_st[7, c]

            # ---- carrier wipe-off (matches pallas_epl kernel) --------
            ang = ph + (dop / fs) * k
            ang = ang - jnp.floor(ang)
            cosv = jnp.cos(two_pi * ang)
            sinv = jnp.sin(two_pi * ang)
            yr = xr * cosv + xi * sinv
            yi = xi * cosv - xr * sinv

            # ---- E/P/L: dynamic rotate of the doubled code -----------
            m = jnp.floor(2.0 * cp).astype(jnp.int32) % S
            m = jnp.where(m == 0, S, m)
            row = u2_ref[pl.ds(c, 1), :]
            sums = []
            for lag in (-1, 0, 1):
                rep = pltpu.roll(row, -(m + lag), 1)[:, :SP]
                sums.append(jnp.sum(yr * rep))
                sums.append(jnp.sum(yi * rep))
            ie, qe, ip, qp, il, ql = sums

            # ---- nav-bit edge-zone freeze (track_epoch_step) ---------
            rem_pred = jnp.mod(epoch - last_swap, cib)
            edge = (sync == 1) & (
                (rem_pred == 0) | (rem_pred == cib - 1))

            # ---- DLL (tracking.c:333-393 gains) ----------------------
            e2 = ie * ie + qe * qe
            l2 = il * il + ql * ql
            cerr_raw = -(e2 - l2) / jnp.maximum(e2 + l2, 1e-12)
            cerr = jnp.where(edge, dll_prev, cerr_raw)
            ddelta = jnp.where(
                edge, 0.0,
                cfg.dll_c1 * (cerr - dll_prev)
                + cfg.dll_c2 * cfg.dt_s * cerr,
            ) / cfg.fine_ratio
            code_freq = cps * (1.0 + dop / FREQ_L1_HZ)
            new_cp = jnp.mod(cp + code_freq * S + ddelta,
                             jnp.float32(CODE_LENGTH))

            # ---- Costas PLL (tracking.c:175-209) ---------------------
            perr = costas_err(ip, qp)
            c1 = jnp.where(sync == 1, cfg.pll_narrow_c1, cfg.pll_wide_c1)
            c2 = jnp.where(sync == 1, cfg.pll_narrow_c2, cfg.pll_wide_c2)
            dphase = perr - pll_prev
            dphase = dphase - jnp.round(dphase)
            pll_delta = (c1 * dphase + c2 * cfg.dt_s * perr) * cfg.pll_scale

            # ---- FLL (tracking.c:214-256) ----------------------------
            fdiff = perr - fll_theta
            fdiff = fdiff - jnp.round(fdiff)
            odiff = fdiff - fll_err
            odiff = odiff - jnp.round(odiff)
            fll_delta = jnp.where(
                (fll_primed == 1) & ~edge,
                (cfg.fll_c1 * cfg.dt_s * odiff
                 + cfg.fll_c2 * cfg.dt_s * fdiff) * cfg.fll_scale,
                0.0,
            )
            new_dop = dop + pll_delta + fll_delta
            new_ph = ph + dop * (S / fs)
            new_ph = new_ph - jnp.floor(new_ph)

            # ---- false-lock watchdog (tracking.c:261-327) ------------
            sgn = jnp.where(ip > 0, 1, -1)
            trans = ((w2 != w1).astype(jnp.int32)
                     + (w3 != w2).astype(jnp.int32)
                     + (sgn != w3).astype(jnp.int32))
            wend = jnp.mod(epoch, cfg.pll_check_window) == (
                cfg.pll_check_window - 1)
            bad2 = jnp.where(
                wend,
                jnp.where(trans > 1, jnp.minimum(bad_cnt + 1, 10),
                          jnp.maximum(bad_cnt - 1, 0)),
                bad_cnt,
            )
            master2 = jnp.where(
                wend & (bad2 > 9), master + 1,
                jnp.where(wend & (bad2 == 0), 0, master),
            )
            kick = master2 > cfg.pll_bad_state_threshold
            # simplified integer LCG jitter (production uses a uint32
            # xorshift variant; both are random around acq doppler)
            u = jnp.mod(
                (epoch * 37 + c) * 1664525 + 1013904223, 1 << 23
            ).astype(jnp.float32) / jnp.float32(1 << 23)
            new_dop = jnp.where(kick, acq_dop + (u - 0.5) * 500.0,
                                new_dop)
            bad2 = jnp.where(kick, 0, bad2)
            master2 = jnp.where(kick, 0, master2)

            # ---- bit sync (nav_data.c:46-138) ------------------------
            flip = sgn != prev_sign
            rem_at = jnp.mod(epoch - last_swap, cib)
            on_grid = (rem_at <= 1) | (rem_at == cib - 1)
            rpc2 = jnp.where(
                flip & on_grid, jnp.minimum(rpc + 1, 10),
                jnp.where(flip, jnp.maximum(rpc - 1, 0), rpc),
            )
            sync2 = jnp.where(
                flip,
                jnp.where(rpc2 > cfg.bit_sync_up, 1,
                          jnp.where(rpc2 < cfg.bit_sync_down, 0, sync)),
                sync,
            )
            ls2 = jnp.where(flip, epoch, last_swap)
            rem2 = jnp.mod(epoch - ls2, cib)
            boundary = (sync2 == 1) & (rem2 < old_rem)
            votes = pos_cnt + neg_cnt
            bit_val = jnp.where(pos_cnt > neg_cnt, 1, 0)
            bit_ready = boundary & (votes > 0)
            bit_epoch = epoch - votes
            p2 = jnp.where(boundary, 0, pos_cnt)
            n2 = jnp.where(boundary, 0, neg_cnt)
            p2 = jnp.where((sync2 == 1) & (ip > 0), p2 + 1, p2)
            n2 = jnp.where((sync2 == 1) & (ip <= 0), n2 + 1, n2)

            # ---- state write-back ------------------------------------
            f32_st[0, c] = new_cp
            f32_st[1, c] = new_dop
            f32_st[2, c] = new_ph
            f32_st[3, c] = cerr
            f32_st[4, c] = perr
            f32_st[5, c] = perr
            f32_st[6, c] = fdiff
            i32_st[0, c] = 1
            i32_st[1, c] = sgn
            i32_st[2, c] = ls2
            i32_st[3, c] = rpc2
            i32_st[4, c] = sync2
            i32_st[5, c] = rem2
            i32_st[6, c] = p2
            i32_st[7, c] = n2
            i32_st[8, c] = w1
            i32_st[9, c] = w2
            i32_st[10, c] = w3
            i32_st[11, c] = sgn
            i32_st[12, c] = bad2
            i32_st[13, c] = master2

            # the output streams in blocks of 8 epoch-rows (SMEM block
            # shapes obey the same (8, 128) sublane tiling rule)
            r = t % 8
            base = c * NOUT
            out_ref[r, base + 0] = ip
            out_ref[r, base + 1] = qp
            out_ref[r, base + 2] = cp
            out_ref[r, base + 3] = new_dop
            out_ref[r, base + 4] = jnp.where(bit_ready, 1.0, 0.0)
            out_ref[r, base + 5] = bit_val.astype(jnp.float32)
            out_ref[r, base + 6] = bit_epoch.astype(jnp.float32)
            out_ref[r, base + 7] = sync2.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chan, channel_body, 0)

        @pl.when(t == t_cnt - 1)
        def _store_state():
            for i in range(NF32):
                for c in range(n_chan):
                    f32_out[i, c] = f32_st[i, c]
            for i in range(NI32):
                for c in range(n_chan):
                    i32_out[i, c] = i32_st[i, c]

    return kernel


class PallasScanState(NamedTuple):
    """Packed kernel state: f32 (NF32, C) and i32 (NI32, C) planes
    (row order = _F32_FIELDS / _I32_FIELDS)."""

    f32: jnp.ndarray
    i32: jnp.ndarray


def state_from_track_state(ts) -> PallasScanState:
    """Pack the production TrackState into the kernel's SMEM planes
    (watchdog/SNR fields are dropped — not in-kernel, see module doc)."""
    f32 = jnp.stack([
        ts.code_phase_chips, ts.doppler_hz, ts.carrier_phase_cycles,
        ts.dll_err_prev, ts.pll_err_prev, ts.fll_theta_prev,
        ts.fll_err_prev, ts.acq_doppler_hz,
    ]).astype(jnp.float32)
    win = ts.ip_sign_window.astype(jnp.int32)
    i32 = jnp.stack([
        ts.fll_primed.astype(jnp.int32),
        ts.prev_ip_sign.astype(jnp.int32),
        ts.last_swap_epoch.astype(jnp.int32),
        ts.right_period_cnt.astype(jnp.int32),
        ts.period_sync_ok.astype(jnp.int32),
        ts.old_remainder.astype(jnp.int32),
        ts.bit_pos_cnt.astype(jnp.int32),
        ts.bit_neg_cnt.astype(jnp.int32),
        win[:, 0], win[:, 1], win[:, 2], win[:, 3],
        ts.pll_bad_cnt.astype(jnp.int32),
        ts.pll_bad_master_cnt.astype(jnp.int32),
    ])
    return PallasScanState(f32=f32, i32=i32)


@functools.partial(
    jax.jit, static_argnames=("plan", "cfg", "interpret")
)
def pallas_track_scan(
    state: PallasScanState,
    epochs: jnp.ndarray,       # (T, S) complex64
    u2: jnp.ndarray,           # (C, U2P) doubled upsampled codes
    start_epoch,               # int32 — ledger epoch of epochs[0]
    plan: SignalPlan,
    cfg: TrackConfig,
    interpret: bool = False,
):
    """Run T epochs fully in-kernel.

    Returns ``(new_state, outs)`` with outs (T, C, NOUT) float32 — slot
    layout documented at NOUT above."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_cnt, s_cnt = epochs.shape
    assert s_cnt == S, "pallas scan requires the 2.046 MHz baseband plan"
    c = u2.shape[0]
    assert c % 8 == 0, "channel count must be a multiple of 8"
    assert cfg.pll_check_window == 4, (
        "in-kernel watchdog ring is compiled for pll_check_window=4")

    t_pad = -(-t_cnt // 8) * 8  # output rows padded to the sublane tile
    x = jnp.zeros((t_cnt, 2, SP), jnp.float32)
    x = x.at[:, 0, :S].set(epochs.real)
    x = x.at[:, 1, :S].set(epochs.imag)
    start2 = jnp.reshape(jnp.asarray(start_epoch, jnp.int32), (1, 1))

    kern = _kernel(cfg, plan, c, t_cnt)
    out, f32_out, i32_out = pl.pallas_call(
        kern,
        grid=(t_cnt,),
        in_specs=[
            pl.BlockSpec((NF32, c), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NI32, c), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, SP), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, U2P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, c * NOUT), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NF32, c), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NI32, c), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, c * NOUT), jnp.float32),
            jax.ShapeDtypeStruct((NF32, c), jnp.float32),
            jax.ShapeDtypeStruct((NI32, c), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((NF32, c), jnp.float32),
            pltpu.SMEM((NI32, c), jnp.int32),
        ],
        interpret=interpret,
    )(state.f32, state.i32, start2, x, u2)
    outs = out[:t_cnt].reshape(t_cnt, c, NOUT)
    return PallasScanState(f32=f32_out, i32=i32_out), outs