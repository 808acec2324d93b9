"""Cold-start fix-floor probe for the DEEP_COHERENT_TRACK chain.

ULTRA_ACQ acquisition -> fine Doppler + pre-track -> aided bit sync ->
100 ms data-wipeoff PLL -> ephemeris decode -> PVT.  Runs the full
Receiver on CPU at a given C/N0 and seed and prints the outcome.

Usage: python tools/deep_cold_probe.py <cn0> [seed] [frame_repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np                 # noqa: E402

from stm32f4_sdr_gps_tpu.config import (  # noqa: E402
    DEEP_COHERENT_TRACK, ULTRA_ACQ, ReceiverConfig)
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.scenarios import fix_scenario  # noqa: E402

cn0 = float(sys.argv[1]) if len(sys.argv) > 1 else 29.0
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 21
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

num_epochs = 6_000 + reps * 30_000
print(f"cn0={cn0} seed={seed} frame_repeats={reps} epochs={num_epochs}",
      flush=True)
t0 = time.time()
sc = fix_scenario(num_epochs=num_epochs, cn0_dbhz=cn0, seed=seed,
                  frame_repeats=reps)
print(f"synth {time.time()-t0:.0f}s", flush=True)
cfg = ReceiverConfig(prns=sc.prns, acq=ULTRA_ACQ,
                     track=DEEP_COHERENT_TRACK, track_block_epochs=1000)
rx = Receiver(cfg)
t0 = time.time()
report = rx.run(sc.samples)
print(f"receiver {time.time()-t0:.0f}s", flush=True)
for ch in report.channels:
    print(f"  prn {ch.prn}: synced={ch.bit_synced} "
          f"eph_full={ch.eph.has_full_set} "
          f"mask={ch.eph.received_mask_proc:#05b} "
          f"snr={ch.snr_db:.1f}", flush=True)
if report.solutions:
    err = np.linalg.norm(report.solutions[-1].rr - sc.rr_true)
    print(f"FIX err={err:.1f} m ({len(report.solutions)} solutions)")
else:
    print("NO FIX")
