"""Bisect WHICH Mosaic construct diverges between real TPU and
interpret mode.

RESOLVED (late round 5): the divergence was `tpu.dynamic_rotate` with
a NEGATIVE amount at NON-power-of-two widths — this file's roll
stages test width 256 (a power of two), which is exactly why they
passed while the production kernel's width-4352/2176 negative rolls
returned garbage.  tools/tpu_roll_wide_probe.py pins the hazard at
production sizes; the kernels now fold amounts into [0, width).

r5 finding (historical): the in-kernel tracking scan, freshly
compiled on the real chip, tracked carrier roughly but lost ~30 dB of
prompt power on a clean planted signal, while the IDENTICAL program
in interpret mode locked perfectly.  Each stage here runs a tiny
program on the device and reads back SCALAR diagnostics only (the one
readback class this transport accepts reliably).

Stages:
  roll      pltpu.roll semantics on a known int plane vs np.roll
  roll-neg  negative shifts (the epl kernel's spelling)
  epl       ops.pallas_epl one-epoch E/P/L on a clean planted signal
            vs the jnp reference correlator (host)
  scan1     one 16-epoch grid step of the in-kernel scan, C=1,
            prompt |P| per epoch folded to scalars

Usage: python tools/tpu_mosaic_bisect.py [stage ...]
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


def stage_roll(neg=False):
    """pltpu.roll on a (8, 256) plane, shifts 0..7 per row; compare to
    np.roll via a checksum of |dev - expected| (scalar readback)."""
    w = 256
    base = np.arange(8 * w, dtype=np.float32).reshape(8, w)
    shifts = np.array([0, 1, 2, 3, 5, 17, 100, 255], np.int32)

    def kernel(x_ref, s_ref, o_ref):
        for r in range(8):
            sft = s_ref[r]
            row = x_ref[pl.ds(r, 1), :]
            if neg:
                o_ref[pl.ds(r, 1), :] = pltpu.roll(row, -sft, 1)
            else:
                o_ref[pl.ds(r, 1), :] = pltpu.roll(row, sft, 1)

    @jax.jit
    def run(x, s):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
            in_specs=[pl.BlockSpec((8, w), lambda: (0, 0)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, w), lambda: (0, 0)),
        )(x, s)
        exp = jnp.stack([
            jnp.roll(x[r], (-s[r] if neg else s[r])) for r in range(8)
        ])
        return jnp.sum(jnp.abs(out - exp)), jnp.sum(out)

    d, tot = run(jnp.asarray(base), jnp.asarray(shifts))
    d = float(np.asarray(d))
    log(f"roll{'-neg' if neg else ''}: sum|dev-expected| = {d:.1f} "
        f"(0 = exact)")
    return d == 0.0


def stage_epl():
    """One-epoch E/P/L: pallas kernel vs jnp reference on a clean
    planted signal, scalar |P| compare."""
    from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import (
        epl_correlate_pallas,
        upsampled_code_doubled,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.signal.simulator import (
        SimSat,
        simulate_capture,
    )

    prn, cp, dop = 7, 300.25, 1234.0
    sat = SimSat(prn=prn, doppler_hz=dop, code_phase_chips=cp,
                 cn0_dbhz=60.0, codes_in_bit=20, nav_bits=[0, 1] * 8)
    x, _ = simulate_capture([sat], num_epochs=1, seed=3)
    # full 8-row sublane tile: C=1 may be a legitimate Mosaic lowering
    # rejection rather than a transport failure
    prns8 = [prn] * 8
    u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar(prns8)))
    xs = jnp.asarray(x[:2046], jnp.complex64)

    @jax.jit
    def dev(xs, u2, cpv, dv, phv):
        epl = epl_correlate_pallas(xs, u2, cpv, dv, phv,
                                   BASEBAND_PLAN.sample_rate_hz)
        return jnp.abs(epl[0, 0]), jnp.abs(epl[0, 1]), jnp.abs(epl[0, 2])

    e, p, l = (float(np.asarray(v)) for v in dev(
        xs, u2, jnp.asarray([cp] * 8, jnp.float32),
        jnp.asarray([dop] * 8, jnp.float32),
        jnp.asarray([0.0] * 8, jnp.float32)))
    # host reference ON THE CPU BACKEND (the reference path's dynamic
    # gathers must not ride the suspect device toolchain)
    from stm32f4_sdr_gps_tpu.ops.correlate import epl_correlate
    from stm32f4_sdr_gps_tpu.ops.replica import sample_replicas
    from stm32f4_sdr_gps_tpu.ops.wipeoff import carrier_wipeoff

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        reps = sample_replicas(jnp.asarray(ca_table_bipolar([prn])),
                               jnp.asarray([cp], jnp.float32),
                               jnp.asarray([1023.0 / 2046.0],
                                           jnp.float32),
                               2046, (-0.5, 0.0, 0.5))
        y, _ = carrier_wipeoff(jnp.asarray(np.asarray(x[:2046]),
                                           jnp.complex64),
                               jnp.asarray([dop], jnp.float32),
                               jnp.asarray([0.0], jnp.float32),
                               BASEBAND_PLAN.sample_rate_hz)
        ref = epl_correlate(y, reps)
    re, rp, rl = (float(abs(np.asarray(ref[0, k]))) for k in range(3))
    log(f"epl dev |E,P,L| = {e:.0f}, {p:.0f}, {l:.0f}; "
        f"ref = {re:.0f}, {rp:.0f}, {rl:.0f}")
    ok = abs(p - rp) / max(rp, 1.0) < 0.05
    log("epl " + ("OK" if ok else "WRONG"))
    return ok


def stage_scan1():
    """16-epoch in-kernel scan at C=1 on a clean signal; per-epoch
    prompt |P| via the raw outputs folded to scalars on device."""
    from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
        pallas_track_scan,
        state_from_track_state,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.signal.simulator import (
        SimSat,
        simulate_capture,
    )
    from stm32f4_sdr_gps_tpu.track.state import init_state

    prn, cp, dop = 7, 300.25, 1234.0
    sat = SimSat(prn=prn, doppler_hz=dop, code_phase_chips=cp,
                 cn0_dbhz=60.0, codes_in_bit=20, nav_bits=[0, 1] * 8)
    x, _ = simulate_capture([sat], num_epochs=16, seed=3)
    u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar([prn])))
    cfg = TrackConfig(pll_bad_state_threshold=10**9)
    st = init_state(1, np.array([cp]), np.array([dop]))
    ps = state_from_track_state(st)
    ep = jnp.asarray(x.reshape(16, 2046), jnp.complex64)

    @jax.jit
    def run(ps, ep, u2):
        ps2, raw = pallas_track_scan(ps, ep, u2, 0, plan=BASEBAND_PLAN,
                                     cfg=cfg)
        from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
            outputs_from_raw,
        )

        outs = outputs_from_raw(raw, cfg)
        pmag = jnp.sqrt(outs.ip[:, 0] ** 2 + outs.qp[:, 0] ** 2)
        return (jnp.mean(pmag), jnp.min(pmag), jnp.max(pmag),
                outs.doppler_hz[-1, 0], outs.code_phase_chips[-1, 0])

    vals = [float(np.asarray(v)) for v in run(ps, ep, u2)]
    log(f"scan1 |P| mean/min/max = {vals[0]:.0f}/{vals[1]:.0f}/"
        f"{vals[2]:.0f}; dop_end {vals[3]:+.1f} (planted {dop:+.1f}); "
        f"cp_end {vals[4]:.2f}")
    # clean 60 dBHz signal: prompt magnitude ~ 0.5*2046 scale
    ok = vals[0] > 300.0
    log("scan1 " + ("OK" if ok else "WRONG"))
    return ok


STAGES = {"roll": lambda: stage_roll(False),
          "roll-neg": lambda: stage_roll(True),
          "epl": stage_epl, "scan1": stage_scan1}

names = sys.argv[1:] or ["roll", "roll-neg", "epl", "scan1"]
for nm in names:
    try:
        STAGES[nm]()
    except Exception as e:  # noqa: BLE001
        log(f"{nm}: EXC {type(e).__name__}: {str(e).splitlines()[0][:90]}")
