"""Tune/validate the extended K-bit data-wipeoff PLL (pll_ext_bits).

Synced-handoff scenario (the aided/fading use case of COHERENT_TRACK):
count nav-bit errors + 95p Doppler error across C/N0 and seeds for the
per-bit loop vs the K-bit loop.  CPU, reference scan path.

Usage: python tools/ext_pll_tune.py [n_bits] [seeds...]
Env: EXT_C1/EXT_C2/EXT_K to override preset gains.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np                 # noqa: E402
import jax.numpy as jnp            # noqa: E402

from stm32f4_sdr_gps_tpu.config import (   # noqa: E402
    BASEBAND_PLAN, COHERENT_TRACK, DEEP_COHERENT_TRACK)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.scenarios import CANONICAL_EPH  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture  # noqa: E402
from stm32f4_sdr_gps_tpu.track.scan import track_block  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402

PLAN = BASEBAND_PLAN
CIB = 20

n_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 75
seeds = [int(s) for s in sys.argv[2:]] or [42, 7, 21]

ext = DEEP_COHERENT_TRACK
if os.environ.get("EXT_C1"):
    ext = dataclasses.replace(ext, pll_ext_c1=float(os.environ["EXT_C1"]))
if os.environ.get("EXT_C2"):
    ext = dataclasses.replace(ext, pll_ext_c2=float(os.environ["EXT_C2"]))
if os.environ.get("EXT_K"):
    ext = dataclasses.replace(ext, pll_ext_bits=int(os.environ["EXT_K"]))
print(f"ext: K={ext.pll_ext_bits} c1={ext.pll_ext_c1} c2={ext.pll_ext_c2} "
      f"dll=({ext.dll_c1},{ext.dll_c2})", flush=True)

code = jnp.asarray(ca_table_bipolar([12]))
stream = build_bitstream(CANONICAL_EPH, start_tow_6s=40,
                         num_subframes=5, subframe_ids=(1, 2, 3, 4, 5))


def run(cfg, cn0, seed):
    bits = list(stream[:n_bits])
    sat = SimSat(prn=12, doppler_hz=250.0, code_phase_chips=0.0,
                 cn0_dbhz=cn0, codes_in_bit=CIB, nav_bits=bits)
    E = CIB * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=seed)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    st = init_state(1, np.array([0.0]), np.array([250.0]))
    st = st._replace(period_sync_ok=jnp.ones(1, bool),
                     right_period_cnt=jnp.full((1,), 10, jnp.int32))
    _, outs = track_block(st, epochs, code, PLAN, cfg)
    ready = np.asarray(outs.bit_ready)[:, 0]
    vals = np.asarray(outs.bit_value)[:, 0][ready]
    eps = np.asarray(outs.bit_epoch)[:, 0][ready].astype(int)
    planted = np.array([bits[e // CIB] for e in eps])
    errs = min(int(np.sum(vals != planted)),
               int(np.sum((1 - vals) != planted)))
    dop = float(np.percentile(
        np.abs(np.asarray(outs.doppler_hz)[:, 0] - 250.0), 95))
    return errs, len(vals), dop


for cn0 in (26.0, 25.0, 24.0, 23.0):
    for name, cfg in (("per-bit", COHERENT_TRACK), ("ext", ext)):
        tot_e = tot_n = 0
        dops = []
        for seed in seeds:
            e, n, d = run(cfg, cn0, seed)
            tot_e += e
            tot_n += n
            dops.append(d)
        print(f"cn0={cn0:4.1f} {name:8s} errs={tot_e:4d}/{tot_n} "
              f"dop95={max(dops):6.2f} Hz", flush=True)
