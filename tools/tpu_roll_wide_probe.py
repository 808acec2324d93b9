"""Localize the Mosaic real-HW tracking-kernel divergence (r5 open item).

tools/tpu_mosaic_bisect.py exonerated `pltpu.roll` on an (8, 256)
plane — but 256 lanes is a POWER OF TWO and the shifts were <= 255.
The production kernel's replica-base rebuild
(ops/pallas_track_scan.py:334-341) does

    pltpu.roll(row, -shift, 1)      # row (1, U2P=4352), shift 0..2045

i.e. a dynamic NEGATIVE roll on a NON-power-of-two width (34 lane
tiles), and the barrel/incremental paths use static rolls at
WIN=2176 (17 tiles).  These stages probe each spelling at the real
production sizes with scalar-checksum readbacks (the one readback
class the axon relay accepts):

  dynu2      dynamic roll, both signs, (8, 4352) f32, shifts 0..2045
  dynwin     dynamic roll at (8, 2176)
  statwin    static rolls (1, 2, 4, 8, WIN-1, WIN-2, WIN-4, WIN-8)
             on (8, 2176)
  barrel     the production 4-stage masked barrel compose on (8, WIN)
             vs a jnp.roll reference
  epoch0     pallas_track_scan T=1 (full barrel + wipeoff + correlate,
             no incremental), HW vs CPU-interpret: |E| |P| |L|
  raw16      pallas_track_scan T=16 (adds the incremental triple),
             per-epoch |P| HW vs CPU-interpret

Usage: python tools/tpu_roll_wide_probe.py [stage ...]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LAST = ["start"]


def log(m):
    _LAST[0] = m
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _die():
    print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr, flush=True)
    os._exit(3)


t = threading.Timer(int(os.environ.get("PROBE_BUDGET_S", "600")), _die)
t.daemon = True
t.start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

log(f"device: {jax.devices()[0]}")

SHIFTS = [0, 1, 7, 292, 1015, 1789, 2038, 2045]


def _roll_stage(width, neg, name):
    """Dynamic pltpu.roll on an (8, width) plane, production spelling
    (scalar shift, per-row pl.ds slice), vs jnp.roll — scalar diff."""
    base = np.arange(8 * width, dtype=np.float32).reshape(8, width)
    shifts = np.array(SHIFTS, np.int32)

    def kernel(x_ref, s_ref, o_ref):
        for r in range(8):
            sft = s_ref[r]
            row = x_ref[pl.ds(r, 1), :]
            amt = -sft if neg else sft
            o_ref[pl.ds(r, 1), :] = pltpu.roll(row, amt, 1)

    @jax.jit
    def run(x, s):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, width), jnp.float32),
            in_specs=[pl.BlockSpec((8, width), lambda: (0, 0)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, width), lambda: (0, 0)),
        )(x, s)
        # per-row diff sums so a single bad shift is identifiable
        diffs = []
        for r in range(8):
            exp = jnp.roll(x[r], (-s[r] if neg else s[r]))
            diffs.append(jnp.sum(jnp.abs(out[r] - exp)))
        return jnp.stack(diffs)

    d = np.asarray(run(jnp.asarray(base), jnp.asarray(shifts)))
    bad = [(SHIFTS[i], float(d[i])) for i in range(8) if d[i] != 0.0]
    log(f"{name}: per-shift sum|dev-expected| "
        f"{'ALL EXACT' if not bad else f'WRONG at {bad}'}")
    return not bad


def stage_statwin():
    """Static rolls at the barrel's amounts on (8, WIN)."""
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import WIN

    amts = [1, 2, 4, 8, WIN - 1, WIN - 2, WIN - 4, WIN - 8]
    base = np.arange(8 * WIN, dtype=np.float32).reshape(8, WIN)

    def kernel2(x_ref, o_ref):
        row = x_ref[pl.ds(0, 1), :]
        for i, a in enumerate(amts):
            o_ref[pl.ds(i, 1), :] = pltpu.roll(row, a, 1)

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((8, WIN), jnp.float32),
            in_specs=[pl.BlockSpec((8, WIN), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, WIN), lambda: (0, 0)),
        )(x)
        diffs = [jnp.sum(jnp.abs(out[i] - jnp.roll(x[0], a)))
                 for i, a in enumerate(amts)]
        return jnp.stack(diffs)

    d = np.asarray(run(jnp.asarray(base)))
    bad = [(amts[i], float(d[i])) for i in range(len(amts)) if d[i] != 0.0]
    log(f"statwin (WIN={WIN}): "
        f"{'ALL EXACT' if not bad else f'WRONG at {bad}'}")
    return not bad


def stage_barrel():
    """The production compose: rebuild (dynamic neg roll on u2) + the
    4-stage masked barrel + P/L rolls, vs jnp.roll of the same code —
    per-channel scalar diffs for E/P/L."""
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import (
        U2P,
        upsampled_code_doubled,
    )
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
        _BARREL_SPAN,
        WIN,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar

    span, stages = _BARREL_SPAN, (1, 2, 4, 8)
    u2 = upsampled_code_doubled(ca_table_bipolar(list(range(1, 9))))
    mcs = np.array([1, 9, 600, 1023, 1500, 2000, 2045, 2046], np.int32)

    def kernel(u2_ref, mc_ref, e_ref, p_ref, l_ref):
        # rebuild: per-channel dynamic negative roll (production spelling)
        for c in range(8):
            mc = mc_ref[c]
            row = u2_ref[pl.ds(c, 1), :]
            shift = mc - 1 - span // 2
            # fixed production spelling: non-negative dynamic amount
            amt = jnp.where(shift > 0, U2P - shift, -shift)
            e_ref[pl.ds(c, 1), :] = pltpu.roll(row, amt, 1)[:, :WIN]
        # full barrel from the rebuilt base (es == span//2 by construction)
        bw = e_ref[...]
        es = jnp.full((8, 1), span // 2, jnp.int32)
        for sft in stages:
            rolled = pltpu.roll(bw, WIN - sft, 1)
            bw = jnp.where((es & sft) != 0, rolled, bw)
        pw = pltpu.roll(bw, WIN - 1, 1)
        lw = pltpu.roll(pw, WIN - 1, 1)
        e_ref[...] = bw
        p_ref[...] = pw
        l_ref[...] = lw

    @jax.jit
    def run(u2d, mc):
        e, p, l = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((8, WIN), jnp.float32)] * 3,
            in_specs=[pl.BlockSpec((8, U2P), lambda: (0, 0)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec((8, WIN), lambda: (0, 0))] * 3,
        )(u2d, mc)
        # expected: E row = u2 rolled left by (mc - 1), i.e. the window
        # starting at half-chip index mc - 1; P at mc; L at mc + 1
        de, dp, dl = [], [], []
        for c in range(8):
            for dst, off, acc in ((e, -1, de), (p, 0, dp), (l, 1, dl)):
                exp = jnp.roll(u2d[c], -(mc[c] + off))[:WIN]
                # junk wraps into lanes >= WIN - (es + 2); production
                # consumes [:SP]; compare the consumed span
                acc.append(jnp.sum(jnp.abs(dst[c, :2048] - exp[:2048])))
        return jnp.stack(de), jnp.stack(dp), jnp.stack(dl)

    de, dp, dl = (np.asarray(v) for v in run(jnp.asarray(u2), jnp.asarray(mcs)))
    bad = [(int(mcs[c]), float(de[c]), float(dp[c]), float(dl[c]))
           for c in range(8) if (de[c] + dp[c] + dl[c]) != 0.0]
    log(f"barrel: {'ALL EXACT' if not bad else f'WRONG at (mc,dE,dP,dL) {bad}'}")
    return not bad


def _scan_compare(n_epochs):
    """pallas_track_scan on HW vs CPU-interpret, per-epoch |P|."""
    from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
        pallas_track_scan,
        state_from_track_state,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
    from stm32f4_sdr_gps_tpu.track.state import init_state

    prn, cp, dop = 7, 300.25, 1234.0
    sat = SimSat(prn=prn, doppler_hz=dop, code_phase_chips=cp,
                 cn0_dbhz=60.0, codes_in_bit=20, nav_bits=[0, 1] * 8)
    x, _ = simulate_capture([sat], num_epochs=n_epochs, seed=3)
    u2 = np.asarray(upsampled_code_doubled(ca_table_bipolar([prn])))
    cfg = TrackConfig(pll_bad_state_threshold=10**9, emit_correlators=True)
    st = init_state(1, np.array([cp]), np.array([dop]),
                    window=cfg.pll_check_window)
    ep = np.asarray(x).reshape(n_epochs, 2046).astype(np.complex64)

    def drive(interp, device):
        with jax.default_device(device):
            ps = state_from_track_state(
                jax.tree.map(jnp.asarray, st))
            _, raw = pallas_track_scan(
                ps, jnp.asarray(ep), jnp.asarray(u2), 0,
                plan=BASEBAND_PLAN, cfg=cfg, interpret=interp)
            return np.asarray(raw)

    cpu = jax.local_devices(backend="cpu")[0]
    ref = drive(True, cpu)
    dev = drive(False, jax.devices()[0])
    pm_r = np.hypot(ref[:, 0, 0], ref[:, 1, 0])
    pm_d = np.hypot(dev[:, 0, 0], dev[:, 1, 0])
    em_d = np.hypot(dev[:, 11, 0], dev[:, 12, 0])
    em_r = np.hypot(ref[:, 11, 0], ref[:, 12, 0])
    log(f"T={n_epochs} |P| interp: " +
        " ".join(f"{v:.0f}" for v in pm_r[: min(16, n_epochs)]))
    log(f"T={n_epochs} |P| device: " +
        " ".join(f"{v:.0f}" for v in pm_d[: min(16, n_epochs)]))
    log(f"T={n_epochs} |E| interp: " +
        " ".join(f"{v:.0f}" for v in em_r[: min(16, n_epochs)]))
    log(f"T={n_epochs} |E| device: " +
        " ".join(f"{v:.0f}" for v in em_d[: min(16, n_epochs)]))
    log(f"T={n_epochs} cp dev/interp @0: {dev[0, 2, 0]:.3f} / "
        f"{ref[0, 2, 0]:.3f}; dop: {dev[0, 3, 0]:+.2f} / {ref[0, 3, 0]:+.2f}")
    ok = float(np.mean(pm_d)) > 0.5 * float(np.mean(pm_r))
    log(f"scan T={n_epochs}: " + ("OK" if ok else "DIVERGES"))
    return ok


STAGES = {
    "dynu2": lambda: _roll_stage(4352, True, "dynu2(4352,neg)") &
                     _roll_stage(4352, False, "dynu2(4352,pos)"),
    "dynwin": lambda: _roll_stage(2176, True, "dynwin(2176,neg)") &
                      _roll_stage(2176, False, "dynwin(2176,pos)"),
    "statwin": stage_statwin,
    "barrel": stage_barrel,
    "epoch0": lambda: _scan_compare(1),
    "raw16": lambda: _scan_compare(16),
}

names = sys.argv[1:] or ["dynu2", "dynwin", "statwin", "barrel",
                         "epoch0", "raw16"]
for nm in names:
    try:
        STAGES[nm]()
    except Exception as e:  # noqa: BLE001
        log(f"{nm}: EXC {type(e).__name__}: {str(e).splitlines()[0][:120]}")
