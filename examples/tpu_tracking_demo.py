"""Run the PRODUCTION TPU tracking program on a synthetic capture.

Drives exactly the per-block jit the Receiver dispatches (and bench.py
headlines): the in-kernel Pallas tracking scan + the on-device block
digest in ONE program (runtime.receiver._track_and_digest_carried) —
measured 447x real-time at 32 channels on a TPU v5e (bench r4,
device-trace; bare kernel 458x; docs/SCALING.md §1).  On TPU the
in-kernel scan is the backend-aware DEFAULT (TrackConfig.in_kernel_scan
= None resolves to it) — this demo only sets it explicitly so the CPU
fallback runs the same kernel in interpret mode:

    python examples/tpu_tracking_demo.py            # CPU interpret
    DEMO_PLATFORM=tpu python examples/tpu_tracking_demo.py

The result printout needs only the ~kB digest read back per block —
small device->host reads work even on the axon relay tunnel (large
reads do not; see tools/tpu_readback_probe.py).  For trustworthy TPU
*timing* use bench.py's trace-based method: wall clock through that
transport does not synchronize.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DEMO_PLATFORM", "cpu") != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np                                          # noqa: E402
import jax.numpy as jnp                                     # noqa: E402

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (  # noqa: E402
    state_from_track_state,
)
from stm32f4_sdr_gps_tpu.runtime.receiver import (  # noqa: E402
    _track_and_digest_carried,
)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state      # noqa: E402


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    plan = BASEBAND_PLAN
    rng = np.random.default_rng(7)
    prns = [2, 7, 15, 24, 30]          # 5 channels: exercises tile padding
    sats = [SimSat(prn=p,
                   doppler_hz=float(rng.uniform(-4000, 4000)),
                   code_phase_chips=float(rng.uniform(0, 1023)),
                   cn0_dbhz=46.0,
                   codes_in_bit=3,
                   nav_bits=list(rng.integers(0, 2, 100)))
            for p in prns]
    epochs_n = 112 if on_cpu else 992   # multiples of the 16-epoch grid
    x, _ = simulate_capture(sats, num_epochs=epochs_n, seed=7)
    epochs = jnp.asarray(x.reshape(epochs_n, plan.samples_per_epoch))

    cfg = TrackConfig(codes_in_bit=3, in_kernel_scan=True,
                      pallas_interpret=on_cpu)
    u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar(prns)))
    st = init_state(
        len(prns),
        np.array([s.code_phase_chips + 0.1 for s in sats]),
        np.array([s.doppler_hz + 2.0 for s in sats]),   # ~fine-refine handoff
        window=cfg.pll_check_window,
    )
    ps = state_from_track_state(st)
    t0 = time.perf_counter()
    # the production per-block program: kernel scan + device digest in
    # one jit; only the digest (and the carried state) come back
    ps, ts, d = _track_and_digest_carried(
        ps, epochs, u2, plan, cfg, 100, True)
    d = jax.tree.map(np.asarray, d)     # the ~kB readback syncs the block
    dt = time.perf_counter() - t0
    print(f"{epochs_n} epochs x {len(prns)} ch on "
          f"{jax.devices()[0].platform} in {dt:.1f} s "
          f"({'interpret mode' if on_cpu else 'native kernel + digest'})")
    print(" PRN   planted Dopp   tracked Dopp    err    C/N0 est  bits")
    from stm32f4_sdr_gps_tpu.runtime.digest import cn0_from_moments

    for i, s in enumerate(sats):
        dop = float(d.doppler_hz[i])
        cn0 = cn0_from_moments(float(d.cn0_m2[i]), float(d.cn0_m4[i]),
                               int(d.cn0_n[i]))
        print(f"  {s.prn:2d}   {s.doppler_hz:+10.1f}   {dop:+10.1f}  "
              f"{dop - s.doppler_hz:+7.2f}   {cn0:7.1f}  {int(d.bit_count[i]):4d}")
        assert abs(dop - s.doppler_hz) < 5.0, "tracking did not converge"
    print("all channels converged (digest-only readback)")


if __name__ == "__main__":
    main()
