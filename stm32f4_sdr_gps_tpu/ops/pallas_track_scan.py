"""The whole tracking scan inside one Pallas kernel (v5, vectorized).

THE production TPU path: ``TrackConfig(in_kernel_scan=True)`` routes
``track.scan.track_block`` — and therefore the ``Receiver`` — through
this kernel (v5 measured 458.7x real time at 32 channels on v5e, vs
v4's 403.9x, v3's 313.6x and v2's 181x; SCALING.md §1 carries the
current numbers).  The ``lax.scan``-of-steps path remains the
CPU/reference backend.
This kernel moves the *entire* loop — code NCO, carrier wipe-off, E/P/L
correlation, DLL/Costas-PLL/FLL, false-lock watchdog, SNR estimator and
bit sync (tracking.c:92-393 + nav_data.c:46-138 equivalents) — into a
single ``pallas_call`` with ``grid=(T/EPB,)``:

* the epoch stream is auto-DMA'd HBM→VMEM by the Pallas pipeline
  (BlockSpec index_map over the grid) — compute overlaps the fetch of
  the next block; EPB epochs run per grid step under an in-kernel
  ``fori_loop`` because the per-step overhead (~3 us) would otherwise
  dominate the ~1.5 us of real per-epoch work;
* ALL per-channel loop state lives in VMEM scratch as (field, C, 1)
  planes persisting across grid steps (TPU grid steps execute
  sequentially on a core), and every loop-filter update is a vector op
  over the channel axis;
* **v4 replica path — incremental barrel.**  v2 cached rolled
  E/P/L replica rows and refreshed them through a per-channel scalar
  ``fori_loop`` guarded by ``pl.when(any(changed))``; measured on v5e
  that machinery was 3.4 of 5.5 us/epoch at 32 channels (62% — the
  round-2 "scalar forest" attribution was actually this: the
  constant-correlator ablation also froze the refresh dynamics).  v3
  kept one *base* window per channel (the doubled code left-rolled to
  ``mc - 8``) and derived the exact E/P/L rows EVERY epoch with a
  4-stage masked barrel: static left-rolls by 1/2/4/8 on the (C, WIN)
  plane, each selected per channel by one bit of ``mc - base - 1``
  (~1.0 of 2.97 us/epoch at 32 channels).  v4 runs that full barrel
  only on the FIRST epoch of each grid step and carries the composed
  E-row window through the epoch ``fori_loop``, advancing it by the
  epoch's mc delta — which the DLL drift bound guarantees is in
  {-1, 0, +1} — with one static roll pair + select.  Bit-exact
  (integer cyclic rolls compose exactly, so the carried window equals
  ``roll(base, -es)``; code wraps fold back via the doubled code's
  S-periodicity; mid-step high-side drift past the masked-stage span
  is absorbed by the window's 128-lane margin), and the scalar rebuild
  loop runs only when a channel's step-start shift leaves [margin,
  span] (each ``any()``→scalar sync costs ~140 ns, so the check is
  hoisted to once per grid step).  An int8 barrel mirror was tried and
  REJECTED: Mosaic has no non-32-bit ``tpu.dynamic_rotate`` lowering;
* the carrier cos/sin ramp — the most expensive VPU op in the kernel —
  is cached per channel (PallasScanState.ramp/.dref, carried state so
  resume stays bit-exact) and rebuilt only when a channel's Doppler
  drifts >8 Hz from its cached value; per epoch the cached ramp gets a
  1st-order residual-frequency correction (~1.2e-3 rad max error, far
  below the correlator noise floor; 2nd order cost 4 more (C,SP)
  passes = 0.1 us/epoch at 32 ch) plus an exact scalar phase rotation.
  **v5 hoisted the refresh GUARD to once per grid step** — the
  per-epoch ``pl.when(jnp.any(vec))`` vector->scalar sync measured
  ~0.3 us/epoch in situ at 32 channels (2.48 -> 2.18 us when hoisted);
  mid-step slew can now exceed the 8 Hz threshold for <EPB epochs
  during transients, absorbed by the 1st-order correction (~0.03 rad
  at a 25 Hz transient residual — still below the noise floor).
  Replacing the per-epoch correction entirely with a per-step
  first-order ramp ROTATION was tried and REJECTED: the mean-residual
  phase can be absorbed into the scalar rotation exactly, but the
  uncorrected per-sample phase profile changes the |E|^2/|L|^2 DLL
  cross terms enough that a channel settles a different closed-loop
  equilibrium (1.3 Hz Doppler offset vs the reference scan — outside
  the parity bar).  Likewise carrying the E/P/L TRIPLE through the
  epoch loop (one new roll/epoch instead of four) measured WORSE
  (2.36 vs 2.18 us): three (C, WIN) fori_loop carries cost more than
  the saved lane-crossing rolls;
* scalar-sized transcendentals are polynomial: the per-epoch (C, 1)
  carrier-phase cos/sin uses a quadrant-reduced Taylor kernel —
  tiny-vector ``jnp.cos``/``jnp.sin``/``jnp.log`` each cost 100-200 ns
  of fixed latency on the VPU (tools/forest_probe2.py), the polynomial
  a few ns; the SNR 10*log10 left the kernel entirely in v5 (the
  completed window sums are latched in-kernel, the log runs once per
  block in outputs_from_raw);
* the bit-sync/watchdog epoch remainders are carried incrementally
  (integer mod has no TPU hardware unit — ~24 ns per ``irem``);
* per-epoch observables are stacked along the SUBLANE axis into an
  (EPB, NOUT, C, 1) output block — lane-axis concatenation of the
  NOUT pieces measured +172 ns/epoch, the sublane stack is free.

Feature set matches v2: in-kernel SNR estimator (tracking.c:147-169),
coherent-bit-vote and 20 ms coherent-PLL modes
(TrackConfig.coherent_bit_vote/coherent_pll), watchdog window length
from ``cfg.pll_check_window``, integer-exact watchdog kick LCG, and a
per-channel epoch counter (late-rise concat safe).  The only remaining
numeric deltas vs track_epoch_step are the half-chip replica
equivalence shared with ops.pallas_epl, the polynomial Costas
discriminator (atan2 has no Mosaic lowering), and the ~1e-7-level
polynomial sincos/log, all far below the correlator noise floor.

Validated against track_block in interpreter mode
(tests/test_pallas_scan.py, including exact integer bit-sync
agreement); Mosaic notes that shaped this design live in CLAUDE.md
(scalar VMEM loads lower as 1-element vector.load + extract; no scalar
stores to VMEM; SMEM takes scalar load/store; iota must be integer;
unaligned lane slices are illegal — ``pltpu.roll`` handles the
data-dependent code shifts; static roll shifts must be non-negative,
so a left-roll by s is spelled ``pltpu.roll(x, WIN - s)``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CODE_LENGTH, FREQ_L1_HZ, SignalPlan, TrackConfig
from ..track.state import TrackOutputs, TrackState
from .pallas_epl import S, SP, U2P

# state plane rows (each field is a (C, 1) vector row of the plane)
_F32_FIELDS = (
    "code_phase", "doppler", "carrier_phase",
    "dll_prev", "pll_prev", "fll_theta", "fll_err", "acq_doppler",
    "snr_i_sum", "snr_q_sum", "snr_li", "snr_lq", "bit_ip_sum",
    "bit_qp_sum", "ext_ip_sum", "ext_qp_sum",
)
_I32_FIELDS = (
    "fll_primed", "prev_sign", "last_swap", "rpc", "sync",
    "old_rem", "pos_cnt", "neg_cnt", "bad_cnt", "master_cnt",
    "snr_cnt", "epoch", "code_wraps", "ext_cnt",
)
NF32 = len(_F32_FIELDS)
NI32 = len(_I32_FIELDS)
# per-epoch output slots (SUBLANE axis of the (EPB, NOUT, C, 1) output
# block): 0 ip, 1 qp, 2 code_phase (epoch start), 3 doppler (updated),
# 4 bit_ready, 5 bit_value, 6 bit_epoch, 7 period_sync_ok,
# 8 snr_li (latched |I| window sum), 9 code_wrapped, 10 snr_lq
# (latched |Q| window sum; snr_db = 10*log10(li/lq) is applied OUTSIDE
# the kernel in outputs_from_raw — the SNR log ran in-kernel through
# v4 at ~23 tiny-op/epoch of unconditional select cost), then ONLY
# when cfg.emit_correlators: 11 ie, 12 qe, 13 il, 14 ql.  Production
# (no correlator diagnostics) writes the 11-slot block.
NOUT = 16          # historical full layout (docs/tests reference)


def _nout(cfg: TrackConfig) -> int:
    return 15 if cfg.emit_correlators else 11

# carrier-ramp cache refresh threshold (Hz): the per-epoch 1st-order
# delta-f correction is accurate to ~1.2e-3 rad at this residual.  The
# refresh CHECK runs once per grid step (v5) — mid-step slew can push
# the residual past the threshold by EPB * (PLL slew/epoch) until the
# next step's check; see the step-level refresh comment in _kernel.
_RAMP_REFRESH_HZ = 8.0

# epochs per grid step: each TPU grid step carries fixed
# DMA/synchronization overhead (~3 us measured at 1 epoch/step, 60% of
# the step), so EPB epochs run per step under an in-kernel fori_loop.
# 16 also amortizes the per-step full barrel of the v4 incremental
# replica path (16: 2.48 us/epoch at 32 ch vs 8: 2.51, 32: 2.78)
EPB = 16
# unroll the EPB loop (perf experiment knob, trace-time constant like
# EPB — one value per process)
UNROLL = False

# replica base window: 2048 output lanes + one 128-lane tile of barrel
# margin (composed left-shift stays well inside: span + step drift +
# the P/L rolls <= ~22 lanes)
WIN = SP + 128
# barrel range: the FULL 4-stage barrel (grid-step epoch 0) needs
# e_shift = mc - base - 1 in [0, span]; the base is rebuilt at
# mc - 1 - span // 2 when the step-start check sees it below the drift
# margin or above span.  Epochs 1..EPB-1 advance the carried window
# incrementally (delta in {-1,0,+1} by the DLL drift bound), so
# mid-step the shift may exceed span — the 128-lane window margin
# absorbs it and the next step's check rebuilds first.  A 3-stage
# span-7 barrel was tried for the then-per-epoch barrel and REJECTED
# (3.53 vs 3.19 us/epoch: rebuilds too frequent); with the v4
# incremental path the full barrel runs once per grid step, so span 15
# stays the right trade.
_BARREL_SPAN = 15


def _kernel(cfg: TrackConfig, plan: SignalPlan, n_chan: int, t_cnt: int,
            win_len: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # cfg.ablate: perf-debug knob (tools/epb_probe.py) — strips one
    # section so its device cost can be measured by difference.  Part of
    # the static jit key (TrackConfig field), so variants never collide
    # in the jit cache (ADVICE r2: the old PTS_ABLATE env var was read
    # at trace time and silently reused stale compilations).  NEVER set
    # in production; values: "ramp" (skip the residual-frequency
    # correction), "wipeoff" (skip the carrier wipe-off entirely),
    # "correlators" (E/P/L sums replaced by zeros), "nobarrel" (E/P/L
    # taken unrolled from the base window — isolates the barrel cost),
    # "freeze_ramp" (build the carrier ramp exactly once).
    ablate = cfg.ablate

    fs = plan.sample_rate_hz
    cps = float(plan.chips_per_sample)
    cib = cfg.codes_in_bit
    two_pi = float(2.0 * np.pi)
    f32 = jnp.float32

    # Worst-case half-chips of code-phase motion per epoch, from the
    # DLL gains (|cerr| <= 1) plus Doppler-rate slack: bounds how far mc
    # can drift inside one grid step, so the base-rebuild check can run
    # once per STEP instead of per epoch (each any()->scalar sync costs
    # ~140 ns).  The check itself is exact either way — the barrel
    # reproduces E/P/L exactly for any in-range base.
    _drift1 = 2.0 * ((cfg.dll_c1 * 2.0 + cfg.dll_c2 * cfg.dt_s)
                     / cfg.fine_ratio + 1e-3)
    _margin = int(np.ceil(EPB * _drift1))
    # Barrel span is FIXED at 15 (4 masked stages).  A 3-stage span-7
    # barrel was tried and REJECTED (measured 3.53 vs 3.19 us/epoch at
    # 32 ch): with rebuild margin 3 only es in {3, 4} avoids a rebuild,
    # and under DLL dither some channel crosses a half-chip boundary
    # almost every grid step — each crossing triggers the all-channel
    # scalar rebuild loop, which costs far more than the fourth masked
    # stage saves.  Span 15 leaves +/-4 half-chips of slack after each
    # recenter, keeping rebuilds rare.
    span, stages = _BARREL_SPAN, (1, 2, 4, 8)
    # v4 incremental barrel: the full 4-stage barrel runs only on the
    # FIRST epoch of each grid step; epochs 1..EPB-1 carry the composed
    # E-row window through the fori_loop and advance it by the epoch's
    # mc delta, which the DLL drift bound guarantees is in {-1, 0, +1}
    # (|ddelta| <= (dll_c1*2 + dll_c2*dt)/fine_ratio + code-Doppler
    # << 1 half-chip/epoch).  One roll-pair + select replaces the four
    # masked roll-selects (measured: the per-epoch barrel was 1.01 of
    # 2.97 us at 32 ch).  Exactness: cyclic rolls compose, so the
    # carried window equals roll(base, -es) bit for bit; junk wrapping
    # in at the right edge stays in lanes >= WIN - (es + 2), and the
    # rebuild check keeps 0 <= es at every epoch (low-side margin) while
    # the 128-lane window margin absorbs high-side mid-step drift (es
    # may exceed the masked-stage span mid-step; the NEXT step's check
    # then rebuilds before its epoch-0 full barrel needs es <= span).
    _incremental = _drift1 < 1.0
    _hoist_rebuild = _incremental or _margin <= (span - 1) // 2
    nout = _nout(cfg)

    def costas_err(ip, qp):
        """atan2(qp*sign(ip), |ip|)/pi without atan2 (no Mosaic
        lowering): octant fold + 9th-order polynomial, ~1e-5 rad —
        far below the correlator noise floor."""
        y = qp * jnp.sign(ip)
        ax = jnp.abs(ip)
        ay = jnp.abs(y)
        z = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
        z2 = z * z
        p = f32(0.0208351)
        p = p * z2 - 0.0851330
        p = p * z2 + 0.1801410
        p = p * z2 - 0.3302995
        p = p * z2 + 0.9998660
        a = z * p
        a = jnp.where(ay > ax, np.pi / 2 - a, a)
        return jnp.sign(y) * a / np.pi

    def sincos_cycles(ph):
        """cos/sin of 2*pi*ph for tiny (C, 1) operands.

        jnp.cos+jnp.sin cost ~200 ns of fixed VPU latency at this size
        (tools/forest_probe2.py); quadrant reduction + Taylor to t^8/t^9
        is ~25 cheap ops with error < 3e-7."""
        v = 4.0 * (ph - jnp.round(ph))          # quarter-cycles in [-2, 2]
        q = jnp.round(v)                         # {-2,-1,0,1,2}
        t = (v - q) * f32(np.pi / 2.0)           # [-pi/4, pi/4]
        t2 = t * t
        c = f32(1.0 / 40320.0)
        c = c * t2 - f32(1.0 / 720.0)
        c = c * t2 + f32(1.0 / 24.0)
        c = c * t2 - f32(0.5)
        c = c * t2 + f32(1.0)
        s = f32(1.0 / 362880.0)
        s = s * t2 - f32(1.0 / 5040.0)
        s = s * t2 + f32(1.0 / 120.0)
        s = s * t2 - f32(1.0 / 6.0)
        s = s * t2 + f32(1.0)
        s = s * t
        cq = jnp.where(q == 0, c,
                       jnp.where(q == 1, -s, jnp.where(q == -1, s, -c)))
        sq = jnp.where(q == 0, s,
                       jnp.where(q == 1, c, jnp.where(q == -1, -c, -s)))
        return cq, sq

    def wrap_half(x):
        return x - jnp.round(x)

    def lcg_uniform(seed_i32):
        """Integer-exact port of track.scan._lcg_uniform: int32 wraps
        reproduce uint32 multiplies; logical shifts reproduce uint32
        shifts, so the result bits match the production scan."""
        s = seed_i32 * jnp.int32(1664525) + jnp.int32(1013904223)
        s = s ^ jax.lax.shift_right_logical(s, 16)
        s = s * jnp.int32(np.int64(2246822519) - (1 << 32))
        return jax.lax.shift_right_logical(s, 8).astype(f32) * f32(
            1.0 / (1 << 24))

    def kernel(f32_init, i32_init, win_init, x_ref, u2_ref,
               ramp_init, dref_init,
               out_ref, f32_out, i32_out, win_out, ramp_out, dref_out,
               f32_st, i32_st, win_st, base_st, b_plane,
               rem_st, wcnt_st, ramp_st, dref, epl_st):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _load_state():
            for i in range(NF32):
                f32_st[i] = f32_init[i]
            for i in range(NI32):
                i32_st[i] = i32_init[i]
            for i in range(win_len):
                win_st[i] = win_init[i]
            # force a replica-base rebuild on epoch 0
            b_plane[0] = jnp.full((n_chan, 1), -(2 ** 20), jnp.int32)
            # incremental epoch remainders (integer mod is ~24 ns on the
            # VPU — pay it once per kernel call, then carry): rem =
            # (epoch - last_swap) mod codes_in_bit, wcnt = epoch mod
            # watchdog window.  Recomputed exactly from carried state at
            # every kernel entry, so resume stays bit-exact.
            rem_st[0] = jnp.mod(i32_init[11] - i32_init[2], cib)
            wcnt_st[0] = jnp.mod(i32_init[11], win_len)
            # carrier-ramp cache is CARRIED state (PallasScanState.ramp
            # / .dref): a resumed run must continue with the exact cache
            # the unbroken run would hold, or split-vs-full outputs
            # diverge at the correction's ~1e-5 level
            ramp_st[0] = ramp_init[0]
            ramp_st[1] = ramp_init[1]
            dref[0] = dref_init[0]

        # ---- replica-base rebuild (the only per-channel loop) ----------
        # Runs only when a channel's integer half-chip shift mc leaves
        # the barrel range of its base (>15 half-chips of drift, i.e.
        # hundreds of epochs, a code wrap, or an acquisition handoff).
        # Each rebuild re-centers EVERY channel's base window at
        # mc - 1 - span/2.
        def rebuild_body(c, _):
            cpc = f32_st[0, c, 0]
            mc = jnp.floor(2.0 * cpc).astype(jnp.int32)
            mc = jnp.where(mc == 0, S, mc)
            row = u2_ref[pl.ds(c, 1), :]
            shift = mc - 1 - span // 2          # in [-7, S - 8]
            # dynamic roll amounts must be NON-NEGATIVE: on real v5e
            # hardware (axon relay toolchain) tpu.dynamic_rotate with a
            # negative amount produces garbage on non-power-of-two
            # widths — every nonzero negative shift wrong at width
            # 4352/2176 while positive amounts and the interpret path
            # are exact (tools/tpu_roll_wide_probe.py; this was the r5
            # whole-kernel 30 dB prompt-power divergence).  Left-roll
            # by `shift` is spelled as a right-roll by U2P - shift,
            # folded into [0, U2P).
            amt = jnp.where(shift > 0, U2P - shift, -shift)
            base_st[pl.ds(c, 1), :] = pltpu.roll(row, amt, 1)[:, :WIN]
            return 0

        def _mc_now():
            cp = f32_st[0]
            mc = jnp.floor(2.0 * cp).astype(jnp.int32)
            return jnp.where(mc == 0, S, mc)

        def _fold(v):
            # a code wrap jumps mc by +-S; the doubled code is
            # S-periodic (u2[j] == u2[j+S] everywhere), so fold shifts
            # and deltas back into barrel range
            return jnp.where(v < -1023, v + S,
                             jnp.where(v > 1023, v - S, v))

        if _hoist_rebuild:
            # once per grid step: rebuild any base whose epoch-0 barrel
            # shift is outside [0, span], or (incremental mode) could
            # drift below 0 within the step (high-side mid-step drift
            # is absorbed by the window's 128-lane margin; the next
            # step's check rebuilds before ITS epoch-0 barrel)
            mc0 = _mc_now()
            es0 = _fold(mc0 - b_plane[0] - 1)
            hi = span if _incremental else span - _margin

            @pl.when(jnp.any((es0 < _margin) | (es0 > hi)))
            def _rebuild_bases_step():
                jax.lax.fori_loop(0, n_chan, rebuild_body, 0)
                b_plane[0] = mc0 - 1 - span // 2

        # ---- carrier-ramp refresh, once per grid step (v5) -------------
        # The refresh guard was per-epoch through v4; a
        # `pl.when(jnp.any(vec))` costs ~141 ns of vector->scalar sync
        # (tools/forest_probe2.py) — 5.7% of the 2.48 us epoch.  Hoisted
        # here it amortizes to ~9 ns/epoch at EPB=16.  Cost of the
        # coarser check: the residual-frequency first-order correction
        # in the epoch body now absorbs up to EPB epochs of PLL slew on
        # top of the 8 Hz threshold (normal slew ~1-2 Hz/epoch ->
        # worst-case mid-step residual ~25-40 Hz = 0.03-0.16 rad
        # first-order error for <EPB epochs during pull-in transients,
        # still below the correlator noise floor); a watchdog-kicked
        # channel (+-250 Hz jump) correlates smeared until the next
        # step's refresh — a <EPB-epoch extension of a relock transient
        # that already takes hundreds of epochs.  The `g * EPB < t_cnt`
        # gate keeps trailing pad steps from touching the carried
        # ramp/dref state (split-vs-full resume handoff).
        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, SP), 1).astype(f32)
        dop_step = f32_st[1]
        if ablate == "freeze_ramp":
            # build exactly once (step 0), cheap scalar predicate
            ramp_cond = g == 0
        else:
            ramp_cond = (g * EPB < t_cnt) & jnp.any(
                jnp.abs(dop_step - dref[0]) > _RAMP_REFRESH_HZ)

        @pl.when(ramp_cond)
        def _refresh_ramp():
            a = (dop_step / fs) * k_iota
            a = a - jnp.floor(a)
            ramp_st[0] = jnp.cos(two_pi * a)
            ramp_st[1] = jnp.sin(two_pi * a)
            dref[0] = dop_step

        # ---- replica-window producers ---------------------------------
        # v5.1 keeps the E/P/L TRIPLE in VMEM scratch (epl_st) instead
        # of deriving P/L from the carried E window every epoch.
        # P == roll(E, left 1) and L == roll(E, left 2) always, so
        # advancing the triple by the epoch's mc delta d (in {-1, 0,
        # +1} by the DLL drift bound) is mostly a PERMUTATION of the
        # scratch rows — d=+1: (E,P,L) <- (P, L, roll(L, left 1));
        # d=-1: (E,P,L) <- (roll(E, right 1), E, P) — so one epoch
        # costs 2 lane-crossing rolls (~125 ns each, the dominant
        # barrel cost) + 6 elementwise selects + the scratch
        # round-trip, where v4/v5 cost 4 rolls (advance pair + P/L
        # derivation).  Carrying the triple as fori_loop VALUES was
        # tried first and REJECTED (2.36 vs 2.18 us: the functional
        # carry copies cost more than the saved rolls); scratch
        # updates are in place.  Bit-exact: cyclic rolls compose, so
        # each row equals the corresponding roll of the base window.
        if ablate != "nobarrel":
            def make_epl_full():
                """E/P/L windows from the base via the 4-stage masked
                barrel (first epoch of each grid step; the rebuild
                check guarantees es in [0, span] here)."""
                mc = _mc_now()
                es = _fold(mc - b_plane[0] - 1)
                bw = base_st[...]
                for sft in stages:
                    rolled = pltpu.roll(bw, WIN - sft, 1)
                    bw = jnp.where((es & sft) != 0, rolled, bw)
                pw = pltpu.roll(bw, WIN - 1, 1)
                lw = pltpu.roll(pw, WIN - 1, 1)
                return (bw, pw, lw), mc

            def make_epl_incr(mc_prev):
                """Advance the scratch E/P/L triple by this epoch's mc
                delta (code wraps fold to +-1 via S-periodicity)."""
                ew = epl_st[0]
                pw = epl_st[1]
                lw = epl_st[2]
                mc = _mc_now()
                d = _fold(mc - mc_prev)
                lleft = pltpu.roll(lw, WIN - 1, 1)
                eright = pltpu.roll(ew, 1, 1)
                up = d == 1
                dn = d == -1
                e2 = jnp.where(up, pw, jnp.where(dn, eright, ew))
                p2 = jnp.where(up, lw, jnp.where(dn, ew, pw))
                l2 = jnp.where(up, lleft, jnp.where(dn, pw, lw))
                return (e2, p2, l2), mc
        else:
            def make_epl_full():
                b = base_st[...]
                return (b, b, b), _mc_now()

            def make_epl_incr(mc_prev):
                return (epl_st[0], epl_st[1], epl_st[2]), mc_prev

        # ---- EPB epochs per grid step (amortizes per-step overhead) ----
        def epoch_tail(ei, epl):
            # trailing pad epochs (t_cnt not a multiple of EPB) are
            # skipped entirely: no state advance, output rows sliced off
            # (the pl.when predication is free on TPU — measured
            # guard-vs-unguarded identical)
            @pl.when(g * EPB + ei < t_cnt)
            def _valid_epoch():
                # ---- whole-plane state loads (one ref op per plane;
                # the [i] slices below are value-level) ---------------
                fS = f32_st[...]
                iS = i32_st[...]
                wS = win_st[...]
                rem = rem_st[0]        # (epoch - last_swap) mod cib
                wcnt = wcnt_st[0]      # epoch mod pll_check_window

                # ---- vector state reads (value-level plane slices) ----
                cp = fS[0]
                dop = fS[1]
                ph = fS[2]
                dll_prev = fS[3]
                pll_prev = fS[4]
                fll_theta = fS[5]
                fll_err = fS[6]
                acq_dop = fS[7]
                snr_i = fS[8]
                snr_q = fS[9]
                snr_li = fS[10]
                snr_lq = fS[11]
                bit_ip = fS[12]
                bit_qp = fS[13]
                ext_ip = fS[14]
                ext_qp = fS[15]
                fll_primed = iS[0]
                prev_sign = iS[1]
                last_swap = iS[2]
                rpc = iS[3]
                sync = iS[4]
                old_rem = iS[5]
                pos_cnt = iS[6]
                neg_cnt = iS[7]
                bad_cnt = iS[8]
                master = iS[9]
                snr_cnt = iS[10]
                epoch = iS[11]
                wraps = iS[12]
                ext_cnt = iS[13]
                in_sync = sync == 1

                # ---- replica rows from the scratch triple -------------
                # epl = the E/P/L windows at this epoch's integer
                # half-chip shift mc (ops.pallas_epl equivalence),
                # produced by make_epl_full (first epoch of the step)
                # or make_epl_incr (scratch triple + delta roll).  Junk
                # wrapping in from the right edge stays in lanes >=
                # WIN - (es + 2) >= SP, outside the [0, SP) slice.
                rep_e = epl[0][:, :SP]
                rep_p = epl[1][:, :SP]
                rep_l = epl[2][:, :SP]

                # ---- carrier wipe-off, all channels at once -----------
                # cos/sin over (C, SP) are the single most expensive VPU
                # ops in the kernel (~1.7 us/epoch measured), so the
                # Doppler ramp e^{j*2pi*(dop/fs)*k} is cached per channel
                # and re-built (vectorized, all channels at once, at the
                # grid-step-level refresh above) only when a channel's
                # Doppler moved > _RAMP_REFRESH_HZ from its cached
                # value.  Per epoch the cached ramp is corrected by the
                # residual delta-f to FIRST order, then rotated by the
                # scalar carrier phase.
                k = k_iota
                rc = ramp_st[0]
                rs = ramp_st[1]
                if ablate == "ramp":
                    cosd = rc
                    sind = rs
                else:
                    # FIRST-order residual rotation (v4): e^{jx} ~ 1+jx.
                    # Max phase error x^2/2 ~ 1.2e-3 rad at the 8 Hz
                    # refresh threshold (2nd order was 2e-5 but cost 4
                    # more (C,SP) passes — measured 0.1 us/epoch at 32
                    # ch); both are far below the correlator noise
                    # floor and the polynomial Costas error.
                    xk = (two_pi / fs) * (dop - dref[0]) * k  # (C,SP) residual
                    cosd = rc - xk * rs
                    sind = rs + xk * rc
                xv = x_ref[ei]                     # one dynamic load: (2, SP)
                xr = xv[0:1, :]
                xi = xv[1:2, :]
                # wipe with the ramp only — the scalar carrier phase is
                # applied AFTER the correlation sums (linearity): 12
                # (C,1) mults replace four full (C,SP) VPU passes
                if ablate == "wipeoff":
                    yr = jnp.broadcast_to(xr, cosd.shape)
                    yi = jnp.broadcast_to(xi, sind.shape)
                else:
                    yr = xr * cosd + xi * sind
                    yi = xi * cosd - xr * sind

                # ---- E/P/L correlations (lane reductions) -------------
                if ablate == "correlators":
                    # one add+reduce keeps the wipeoff alive (no DCE of
                    # the upstream section) while dropping 6 mult+reduce
                    # (NOTE: the barrel outputs rep_* become dead here,
                    # so this measures correlators + barrel together)
                    z = jnp.sum(yr + yi, axis=1, keepdims=True) * 0.0 + 1.0
                    ie_r = qe_r = ip_r = qp_r = il_r = ql_r = z
                elif ablate == "correlators2":
                    # keeps the barrel alive too (rep_* feed the reduce):
                    # measures the six mult+reduce correlators alone
                    z = jnp.sum(yr + yi + rep_e + rep_p + rep_l,
                                axis=1, keepdims=True) * 0.0 + 1.0
                    ie_r = qe_r = ip_r = qp_r = il_r = ql_r = z
                else:
                    ie_r = jnp.sum(yr * rep_e, axis=1, keepdims=True)
                    qe_r = jnp.sum(yi * rep_e, axis=1, keepdims=True)
                    ip_r = jnp.sum(yr * rep_p, axis=1, keepdims=True)
                    qp_r = jnp.sum(yi * rep_p, axis=1, keepdims=True)
                    il_r = jnp.sum(yr * rep_l, axis=1, keepdims=True)
                    ql_r = jnp.sum(yi * rep_l, axis=1, keepdims=True)
                if ablate == "noforest":
                    # measure everything downstream of the correlators
                    # (scalar rotation, polynomial transcendentals,
                    # loop filters, watchdog, SNR, bit sync, write-back
                    # selects) by difference: advance only code phase /
                    # epoch, keep the correlators alive via the SNR sums
                    new_cp = jnp.mod(
                        cp + cps * (1.0 + dop / FREQ_L1_HZ) * S,
                        f32(CODE_LENGTH))
                    f32_st[...] = jnp.stack([
                        new_cp, dop, ph, dll_prev, pll_prev, fll_theta,
                        fll_err, acq_dop, snr_i + ip_r, snr_q + qp_r,
                        snr_li, snr_lq, bit_ip, bit_qp, ext_ip, ext_qp])
                    i32_st[...] = jnp.stack([
                        fll_primed, prev_sign, last_swap, rpc, sync,
                        old_rem, pos_cnt, neg_cnt, bad_cnt, master,
                        snr_cnt, epoch + 1, wraps, ext_cnt])
                    z = jnp.zeros_like(ip_r)
                    out_ref[ei] = jnp.stack(
                        [ip_r, qp_r, cp, dop] + [z] * (nout - 4))
                    return
                pc, ps = sincos_cycles(ph)                    # (C,1) poly
                ip = ip_r * pc + qp_r * ps
                qp = qp_r * pc - ip_r * ps
                if cfg.emit_correlators:
                    # E/L rotation is diagnostics-only: the DLL consumes
                    # |E|^2 and |L|^2, which the scalar phase rotation
                    # preserves exactly — skip 12 ops unless emitting
                    ie = ie_r * pc + qe_r * ps
                    qe = qe_r * pc - ie_r * ps
                    il = il_r * pc + ql_r * ps
                    ql = ql_r * pc - il_r * ps
                else:
                    ie = qe = il = ql = jnp.zeros_like(ip)

                # ---- nav-bit edge-zone freeze (track_epoch_step) ------
                edge = in_sync & ((rem == 0) | (rem == cib - 1))

                # ---- DLL (tracking.c:333-393) -------------------------
                e2 = ie_r * ie_r + qe_r * qe_r
                l2 = il_r * il_r + ql_r * ql_r
                cerr_raw = -(e2 - l2) / jnp.maximum(e2 + l2, 1e-12)
                cerr = jnp.where(edge, dll_prev, cerr_raw)
                ddelta = jnp.where(
                    edge, 0.0,
                    cfg.dll_c1 * (cerr - dll_prev) + cfg.dll_c2 * cfg.dt_s * cerr,
                ) / cfg.fine_ratio
                code_freq = cps * (1.0 + dop / FREQ_L1_HZ)
                unwrapped = cp + code_freq * S + ddelta
                new_cp = jnp.mod(unwrapped, f32(CODE_LENGTH))
                nominal = cp + f32(cps) * S
                wrapped_flag = jnp.abs(unwrapped - nominal) > (CODE_LENGTH / 2)

                # ---- Costas PLL (tracking.c:175-209) ------------------
                perr = costas_err(ip, qp)
                c1 = jnp.where(in_sync, cfg.pll_narrow_c1, cfg.pll_wide_c1)
                c2 = jnp.where(in_sync, cfg.pll_narrow_c2, cfg.pll_wide_c2)
                pll_delta = (
                    c1 * wrap_half(perr - pll_prev) + c2 * cfg.dt_s * perr
                ) * f32(cfg.pll_scale)

                # ---- FLL (tracking.c:214-256) -------------------------
                fdiff = wrap_half(perr - fll_theta)
                odiff = wrap_half(fdiff - fll_err)
                fll_delta = jnp.where(
                    (fll_primed == 1) & ~edge,
                    (cfg.fll_c1 * cfg.dt_s * odiff + cfg.fll_c2 * cfg.dt_s * fdiff)
                    * f32(cfg.fll_scale),
                    0.0,
                )

                # ---- 20 ms coherent PLL (TrackConfig.coherent_pll) ----
                phase_err_store = perr
                ext_ip2, ext_qp2, ext_cnt2 = ext_ip, ext_qp, ext_cnt
                if cfg.coherent_pll:
                    bit_done = in_sync & (rem < old_rem)
                    if cfg.pll_ext_bits > 1:
                        # extended K-bit data-wipeoff PLL: accumulate
                        # sign-decided bit prompt vectors, close the
                        # loop on the K-bit coherent sum (track.scan
                        # reference-path equivalent)
                        d = jnp.where(bit_ip >= 0, 1.0, -1.0)
                        ext_ip2 = ext_ip + jnp.where(
                            bit_done, d * bit_ip, 0.0)
                        ext_qp2 = ext_qp + jnp.where(
                            bit_done, d * bit_qp, 0.0)
                        ext_cnt2 = ext_cnt + bit_done.astype(jnp.int32)
                        ext_done = bit_done & (ext_cnt2 >= cfg.pll_ext_bits)
                        perr_ext = costas_err(ext_ip2, ext_qp2)
                        dt_ext = cfg.pll_ext_bits * cib * cfg.dt_s
                        pll_delta_ext = (
                            cfg.pll_ext_c1 * wrap_half(perr_ext - pll_prev)
                            + cfg.pll_ext_c2 * dt_ext * perr_ext
                        ) * f32(cfg.pll_ext_scale)
                        pll_delta = jnp.where(
                            in_sync,
                            jnp.where(ext_done, pll_delta_ext, 0.0),
                            pll_delta,
                        )
                        phase_err_store = jnp.where(
                            in_sync,
                            jnp.where(ext_done, perr_ext, pll_prev),
                            perr,
                        )
                        clear = ext_done | ~in_sync
                        ext_ip2 = jnp.where(clear, 0.0, ext_ip2)
                        ext_qp2 = jnp.where(clear, 0.0, ext_qp2)
                        ext_cnt2 = jnp.where(clear, 0, ext_cnt2)
                    else:
                        perr_bit = costas_err(bit_ip, bit_qp)
                        dt_bit = cib * cfg.dt_s
                        pll_delta_bit = (
                            cfg.pll_bit_c1 * wrap_half(perr_bit - pll_prev)
                            + cfg.pll_bit_c2 * dt_bit * perr_bit
                        ) * f32(cfg.pll_bit_scale)
                        pll_delta = jnp.where(
                            in_sync, jnp.where(bit_done, pll_delta_bit, 0.0),
                            pll_delta,
                        )
                        phase_err_store = jnp.where(
                            in_sync, jnp.where(bit_done, perr_bit, pll_prev),
                            perr,
                        )
                    fll_delta = jnp.where(in_sync, 0.0, fll_delta)

                new_dop = dop + pll_delta + fll_delta
                new_ph = ph + dop * (S / fs)
                new_ph = new_ph - jnp.floor(new_ph)

                # ---- false-lock watchdog (tracking.c:261-327) ---------
                sgn = jnp.where(ip > 0, 1, -1)
                # transitions of the POST-shift window [old[1:], sgn] — the
                # (old[1] != old[0]) pair leaves the window this epoch
                trans = (sgn != wS[win_len - 1]).astype(jnp.int32)
                for i in range(2, win_len):
                    trans = trans + (wS[i] != wS[i - 1]).astype(jnp.int32)
                wend = wcnt == (cfg.pll_check_window - 1)
                bad = trans > 1
                bad2 = jnp.where(
                    wend,
                    jnp.where(bad, jnp.minimum(bad_cnt + 1, 10),
                              jnp.maximum(bad_cnt - 1, 0)),
                    bad_cnt,
                )
                master2 = jnp.where(
                    wend & (bad2 > 9), master + 1,
                    jnp.where(wend & (bad2 == 0), 0, master),
                )
                shifted = jnp.concatenate([wS[1:], sgn[None]], axis=0)
                if cfg.coherent_pll:
                    # the per-epoch sign-transition statistic is meaningless at
                    # the C/N0 this mode targets — freeze the watchdog while
                    # synced (track_epoch_step does the same)
                    hold = in_sync
                    win_st[...] = jnp.where(hold[None], wS, shifted)
                    bad2 = jnp.where(hold, bad_cnt, bad2)
                    master2 = jnp.where(hold, master, master2)
                else:
                    win_st[...] = shifted
                kick = master2 > cfg.pll_bad_state_threshold
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_chan, 1), 0)
                u = lcg_uniform(epoch * 37 + iota_c)
                new_dop = jnp.where(kick, acq_dop + (u - 0.5) * 500.0, new_dop)
                bad2 = jnp.where(kick, 0, bad2)
                master2 = jnp.where(kick, 0, master2)

                # ---- SNR (tracking.c:147-169) -------------------------
                # v5: the window's completed |I|/|Q| sums are LATCHED
                # (2 selects); the 10*log10 ratio — ~23 unconditional
                # tiny ops/epoch through v4 (log_pos polynomial + guards)
                # — moved outside the kernel (outputs_from_raw /
                # state_to_track_state), where it runs once per BLOCK on
                # the emitted sums and XLA-fuses with the digest.
                snr_i2 = snr_i + jnp.abs(ip)
                snr_q2 = snr_q + jnp.abs(qp)
                cnt2 = snr_cnt + 1
                snr_done = cnt2 >= cfg.snr_window_epochs
                snr_li2 = jnp.where(snr_done, snr_i2, snr_li)
                snr_lq2 = jnp.where(snr_done, snr_q2, snr_lq)
                snr_i2 = jnp.where(snr_done, 0.0, snr_i2)
                snr_q2 = jnp.where(snr_done, 0.0, snr_q2)
                cnt2 = jnp.where(snr_done, 0, cnt2)

                # ---- bit sync (nav_data.c:46-138) ---------------------
                flip = sgn != prev_sign
                if cfg.coherent_bit_vote or cfg.coherent_pll:
                    flip = flip & ~in_sync
                on_grid = (rem <= 1) | (rem == cib - 1)
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
                rem2 = jnp.where(flip, 0, rem)
                boundary = (sync2 == 1) & (rem2 < old_rem)
                votes = pos_cnt + neg_cnt
                if cfg.coherent_bit_vote or cfg.coherent_pll:
                    bit_val = jnp.where(bit_ip > 0, 1, 0)
                else:
                    bit_val = jnp.where(pos_cnt > neg_cnt, 1, 0)
                bit_ready = boundary & (votes > 0)
                bit_epoch = epoch - votes
                p2 = jnp.where(boundary, 0, pos_cnt)
                n2 = jnp.where(boundary, 0, neg_cnt)
                p2 = jnp.where((sync2 == 1) & (ip > 0), p2 + 1, p2)
                n2 = jnp.where((sync2 == 1) & (ip <= 0), n2 + 1, n2)
                ip_sum2 = jnp.where(boundary, 0.0, bit_ip)
                ip_sum2 = jnp.where(sync2 == 1, ip_sum2 + ip, ip_sum2)
                qp_sum2 = jnp.where(boundary, 0.0, bit_qp)
                qp_sum2 = jnp.where(sync2 == 1, qp_sum2 + qp, qp_sum2)

                # ---- incremental remainder carries --------------------
                rem_st[0] = jnp.where(rem2 + 1 == cib, 0, rem2 + 1)
                wcnt_st[0] = jnp.where(
                    wcnt + 1 == cfg.pll_check_window, 0, wcnt + 1)

                # ---- state write-back: TWO stacked plane stores -------
                # (field order must match _F32_FIELDS/_I32_FIELDS;
                # acq_doppler is per-epoch constant and written back)
                f32_st[...] = jnp.stack([
                    new_cp, new_dop, new_ph, cerr, phase_err_store,
                    perr, fdiff, acq_dop, snr_i2, snr_q2, snr_li2,
                    snr_lq2, ip_sum2, qp_sum2, ext_ip2, ext_qp2])
                i32_st[...] = jnp.stack([
                    jnp.ones_like(fll_primed), sgn, ls2, rpc2, sync2,
                    rem2, p2, n2, bad2, master2, cnt2, epoch + 1,
                    wraps + wrapped_flag.astype(jnp.int32), ext_cnt2])

                # ---- output: sublane-axis stack (lane concat of the
                # pieces measured +172 ns/epoch; the sublane stack is
                # free).  Production writes the 10-slot block; the
                # correlator-diagnostics slots exist only when emitted.
                if ablate != "noout":
                    pieces = [
                        ip, qp, cp, new_dop,
                        bit_ready.astype(f32), bit_val.astype(f32),
                        bit_epoch.astype(f32), sync2.astype(f32),
                        snr_li2, wrapped_flag.astype(f32), snr_lq2,
                    ]
                    if cfg.emit_correlators:
                        pieces += [ie, qe, il, ql]
                    out_ref[ei] = jnp.stack(pieces)

        if _incremental:
            # epoch 0: full barrel from the (possibly just rebuilt)
            # base, stored into the scratch triple; epochs 1..EPB-1:
            # incremental triple updated in place (pad epochs advance
            # no state, so their delta is 0 and the rows rewrite
            # unchanged)
            epl0, mc0 = make_epl_full()
            epl_st[...] = jnp.stack(epl0)
            epoch_tail(0, epl0)

            def epoch_body(ei, mc_prev):
                epl, mc = make_epl_incr(mc_prev)
                epl_st[...] = jnp.stack(epl)
                epoch_tail(ei, epl)
                return mc

            if UNROLL:
                # static epoch indices (x_ref/out_ref dynamic-index ops
                # cost ~73 ns each) and cross-epoch scheduling, at the
                # price of an 8x larger kernel body to compile
                carry = mc0
                for _ei in range(1, EPB):
                    carry = epoch_body(_ei, carry)
            else:
                jax.lax.fori_loop(1, EPB, epoch_body, mc0)
        else:
            # pathological-gain fallback (> 1 half-chip of code motion
            # per epoch): full barrel every epoch, per-epoch rebuild
            # check when even the step-hoisted margin doesn't fit
            def epoch_body(ei, _):
                if not _hoist_rebuild:
                    mc_chk = _mc_now()
                    es_chk = _fold(mc_chk - b_plane[0] - 1)

                    @pl.when(jnp.any((es_chk < 0) | (es_chk > span)))
                    def _rebuild_bases():
                        jax.lax.fori_loop(0, n_chan, rebuild_body, 0)
                        b_plane[0] = mc_chk - 1 - span // 2

                epl, _mc = make_epl_full()
                epoch_tail(ei, epl)
                return 0

            if UNROLL:
                for _ei in range(EPB):
                    epoch_body(_ei, 0)
            else:
                jax.lax.fori_loop(0, EPB, epoch_body, 0)

        @pl.when(g == -(-t_cnt // EPB) - 1)
        def _store_state():
            for i in range(NF32):
                f32_out[i] = f32_st[i]
            for i in range(NI32):
                i32_out[i] = i32_st[i]
            for i in range(win_len):
                win_out[i] = win_st[i]
            ramp_out[0] = ramp_st[0]
            ramp_out[1] = ramp_st[1]
            dref_out[0] = dref[0]

    return kernel


class PallasScanState(NamedTuple):
    """Packed kernel state: f32 (NF32, C, 1), i32 (NI32, C, 1) planes
    (row order = _F32_FIELDS / _I32_FIELDS), the watchdog sign window
    (W, C, 1), and the carrier-ramp cache (ramp (2, C, SP) cos/sin of
    the per-channel Doppler ramp, dref (1, C, 1) the Doppler each ramp
    row was built at — carried so resume is bit-exact).  The replica
    base windows are NOT carried: the barrel reconstruction is exact,
    so a rebuild at kernel entry reproduces identical correlators."""

    f32: jnp.ndarray
    i32: jnp.ndarray
    win: jnp.ndarray
    ramp: jnp.ndarray
    dref: jnp.ndarray


def state_from_track_state(ts: TrackState) -> PallasScanState:
    """Pack the production TrackState into the kernel's VMEM planes
    (every TrackState field round-trips — see state_to_track_state)."""
    # the kernel carries the latched SNR window sums (snr_li, snr_lq),
    # not the dB value; entering from a TrackState reconstructs an
    # equivalent pair (ratio 10^(db/10) against 1.0) — exact for the
    # init_state db=0 case and within ~1e-6 dB otherwise (the latched
    # pair only feeds the reported dB until the next window completes)
    snr_li = jnp.exp(ts.snr_db.astype(jnp.float32)
                     * jnp.float32(np.log(10.0) / 10.0))
    f32 = jnp.stack([
        ts.code_phase_chips, ts.doppler_hz, ts.carrier_phase_cycles,
        ts.dll_err_prev, ts.pll_err_prev, ts.fll_theta_prev,
        ts.fll_err_prev, ts.acq_doppler_hz,
        ts.snr_i_sum, ts.snr_q_sum, snr_li, jnp.ones_like(snr_li),
        ts.bit_ip_sum, ts.bit_qp_sum,
        ts.ext_ip_sum, ts.ext_qp_sum,
    ]).astype(jnp.float32)[..., None]
    i32 = jnp.stack([
        ts.fll_primed.astype(jnp.int32),
        ts.prev_ip_sign.astype(jnp.int32),
        ts.last_swap_epoch.astype(jnp.int32),
        ts.right_period_cnt.astype(jnp.int32),
        ts.period_sync_ok.astype(jnp.int32),
        ts.old_remainder.astype(jnp.int32),
        ts.bit_pos_cnt.astype(jnp.int32),
        ts.bit_neg_cnt.astype(jnp.int32),
        ts.pll_bad_cnt.astype(jnp.int32),
        ts.pll_bad_master_cnt.astype(jnp.int32),
        ts.snr_cnt.astype(jnp.int32),
        ts.epoch_idx.astype(jnp.int32),
        ts.code_wraps.astype(jnp.int32),
        ts.ext_bit_cnt.astype(jnp.int32),
    ])[..., None]
    win = ts.ip_sign_window.astype(jnp.int32).T[..., None]
    c = f32.shape[1]
    # dref far from any physical Doppler forces a ramp build on epoch 0
    return PallasScanState(
        f32=f32, i32=i32, win=win,
        ramp=jnp.zeros((2, c, SP), jnp.float32),
        dref=(ts.doppler_hz.astype(jnp.float32) - 1e9)[None, :, None],
    )


def _snr_db_from_sums(li: jnp.ndarray, lq: jnp.ndarray) -> jnp.ndarray:
    """10*log10(|I|sum / |Q|sum) from the kernel's latched window sums
    (tracking.c:147-169 formula; the log runs OUTSIDE the kernel since
    v5).  Latched zeros (no window completed yet) map to 0 dB exactly,
    matching the reference scan's initial snr_db."""
    return 10.0 * jnp.log10(jnp.maximum(li, 1e-9)
                            / jnp.maximum(lq, 1e-9))


def state_to_track_state(ps: PallasScanState) -> TrackState:
    """Unpack the kernel planes back into the production TrackState."""
    f = ps.f32[..., 0]
    i = ps.i32[..., 0]
    return TrackState(
        carrier_phase_cycles=f[2],
        doppler_hz=f[1],
        code_phase_chips=f[0],
        dll_err_prev=f[3],
        pll_err_prev=f[4],
        fll_theta_prev=f[5],
        fll_err_prev=f[6],
        fll_primed=i[0].astype(bool),
        ip_sign_window=ps.win[..., 0].T.astype(jnp.int8),
        pll_bad_cnt=i[8],
        pll_bad_master_cnt=i[9],
        acq_doppler_hz=f[7],
        snr_i_sum=f[8],
        snr_q_sum=f[9],
        snr_cnt=i[10],
        snr_db=_snr_db_from_sums(f[10], f[11]),
        prev_ip_sign=i[1].astype(jnp.int8),
        last_swap_epoch=i[2],
        right_period_cnt=i[3],
        period_sync_ok=i[4].astype(bool),
        old_remainder=i[5],
        bit_pos_cnt=i[6],
        bit_neg_cnt=i[7],
        bit_ip_sum=f[12],
        bit_qp_sum=f[13],
        epoch_idx=i[11],
        code_wraps=i[12],
        ext_ip_sum=f[14],
        ext_qp_sum=f[15],
        ext_bit_cnt=i[13],
    )


@functools.partial(
    jax.jit, static_argnames=("plan", "cfg", "interpret")
)
def pallas_track_scan(
    state: PallasScanState,
    epochs: jnp.ndarray,       # (T, S) complex64
    u2: jnp.ndarray,           # (C, U2P) doubled upsampled codes
    start_epoch=0,             # unused (epoch counter is per-channel state)
    plan: SignalPlan = None,
    cfg: TrackConfig = None,
    interpret: bool = False,
):
    """Run T epochs fully in-kernel.

    Returns ``(new_state, outs)`` with outs (T, NOUT, C) float32 — slot
    layout documented at NOUT above.  ``start_epoch`` is accepted for
    API compatibility but ignored: the epoch counter is per-channel
    kernel state (PallasScanState.i32 row 'epoch')."""
    del start_epoch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_cnt, s_cnt = epochs.shape
    assert s_cnt == S, "pallas scan requires the 2.046 MHz baseband plan"
    t_pad = -(-t_cnt // EPB) * EPB
    c_real = u2.shape[0]
    c = -(-c_real // 8) * 8
    if c != c_real:
        # channel planes are (·, C, 1) sublane-tiled rows — pad to the
        # 8-sublane tile by repeating the last channel (channels are
        # independent; pad trajectories are sliced off below), so any
        # receiver channel count works
        pad = c - c_real

        def _pad(leaf):
            return jnp.concatenate(
                [leaf, jnp.repeat(leaf[:, -1:], pad, axis=1)], axis=1)

        state = PallasScanState(
            f32=_pad(state.f32), i32=_pad(state.i32), win=_pad(state.win),
            ramp=_pad(state.ramp), dref=_pad(state.dref))
        u2 = jnp.concatenate([u2, jnp.repeat(u2[-1:], pad, axis=0)], axis=0)
    win_len = state.win.shape[0]
    assert win_len == cfg.pll_check_window
    nout = _nout(cfg)

    x = jnp.zeros((t_pad, 2, SP), jnp.float32)
    x = x.at[:t_cnt, 0, :S].set(epochs.real)
    x = x.at[:t_cnt, 1, :S].set(epochs.imag)

    kern = _kernel(cfg, plan, c, t_cnt, win_len)
    out, f32_out, i32_out, win_out, ramp_out, dref_out = pl.pallas_call(
        kern,
        grid=(t_pad // EPB,),
        in_specs=[
            pl.BlockSpec((NF32, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI32, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_len, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPB, 2, SP), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, U2P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c, SP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((EPB, nout, c, 1), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF32, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI32, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_len, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c, SP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, nout, c, 1), jnp.float32),
            jax.ShapeDtypeStruct((NF32, c, 1), jnp.float32),
            jax.ShapeDtypeStruct((NI32, c, 1), jnp.int32),
            jax.ShapeDtypeStruct((win_len, c, 1), jnp.int32),
            jax.ShapeDtypeStruct((2, c, SP), jnp.float32),
            jax.ShapeDtypeStruct((1, c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NF32, c, 1), jnp.float32),
            pltpu.VMEM((NI32, c, 1), jnp.int32),
            pltpu.VMEM((win_len, c, 1), jnp.int32),
            pltpu.VMEM((c, WIN), jnp.float32),     # replica base windows
            pltpu.VMEM((1, c, 1), jnp.int32),      # base shift b_plane
            pltpu.VMEM((1, c, 1), jnp.int32),      # incremental bit rem
            pltpu.VMEM((1, c, 1), jnp.int32),      # incremental wd count
            pltpu.VMEM((2, c, SP), jnp.float32),   # carrier ramp cache
            pltpu.VMEM((1, c, 1), jnp.float32),    # cached ramp doppler
            pltpu.VMEM((3, c, WIN), jnp.float32),  # E/P/L window triple
        ],
        # per-channel VMEM residency (base windows + ramp cache + u2
        # block, ~60 KB/channel) exceeds Mosaic's default 16 MB scoped
        # limit above ~200 channels; v5e has 128 MB VMEM — raise the cap
        # so channel capacity is hardware-limited, not default-limited
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(state.f32, state.i32, state.win, x, u2, state.ramp, state.dref)
    new_state = PallasScanState(f32=f32_out, i32=i32_out, win=win_out,
                                ramp=ramp_out, dref=dref_out)
    out = out[..., 0]                              # (t_pad, NOUT, c)
    if c != c_real:
        new_state = PallasScanState(
            f32=f32_out[:, :c_real], i32=i32_out[:, :c_real],
            win=win_out[:, :c_real], ramp=ramp_out[:, :c_real],
            dref=dref_out[:, :c_real])
        return new_state, out[:t_cnt, :, :c_real]
    return new_state, out[:t_cnt]


def outputs_from_raw(out: jnp.ndarray, cfg: TrackConfig) -> TrackOutputs:
    """Unpack the kernel's raw (T, NOUT, C) stream into TrackOutputs
    (shared by track_block_pallas and the receiver's carried-state
    track+digest program)."""
    if cfg.emit_correlators:
        diag = dict(ie=out[:, 11], qe=out[:, 12],
                    il=out[:, 13], ql=out[:, 14])
    else:
        z = jnp.zeros((0,), jnp.float32)
        diag = dict(ie=z, qe=z, il=z, ql=z)
    outs = TrackOutputs(
        ip=out[:, 0],
        qp=out[:, 1],
        **diag,
        code_phase_chips=out[:, 2],
        doppler_hz=out[:, 3],
        snr_db=_snr_db_from_sums(out[:, 8], out[:, 10]),
        bit_ready=out[:, 4] > 0.5,
        bit_value=out[:, 5].astype(jnp.int8),
        bit_epoch=out[:, 6].astype(jnp.int32),
        period_sync_ok=out[:, 7] > 0.5,
        code_wrapped=out[:, 9] > 0.5,
    )
    return outs


def track_block_pallas(
    state: TrackState,
    epochs: jnp.ndarray,
    u2: jnp.ndarray,
    plan: SignalPlan,
    cfg: TrackConfig,
    interpret: bool = False,
):
    """Drop-in for track.scan.track_block running the in-kernel scan.

    Same signature contract: ``(final TrackState, TrackOutputs with
    (T, C) leaves)``.  E/L diagnostics honour cfg.emit_correlators.
    Note the PallasScanState (and its carrier-ramp cache) is rebuilt
    from the TrackState on every call here; callers that keep the state
    between blocks should carry the PallasScanState itself — the
    Receiver's in-kernel digest path does (runtime.receiver
    _track_and_digest_carried)."""
    ps = state_from_track_state(state)
    ps2, out = pallas_track_scan(
        ps, epochs, u2, 0, plan=plan, cfg=cfg, interpret=interpret
    )
    return state_to_track_state(ps2), outputs_from_raw(out, cfg)
