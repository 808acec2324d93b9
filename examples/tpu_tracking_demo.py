"""Run the production TPU tracking path on a synthetic multi-satellite
capture and print per-channel results.

Demonstrates the in-kernel Pallas scan as a library user would drive it
(`TrackConfig(in_kernel_scan=True)` + the doubled upsampled code
table), on whatever backend is available:

    python examples/tpu_tracking_demo.py            # CPU interpret
    DEMO_PLATFORM=tpu python examples/tpu_tracking_demo.py

On CPU this uses the Pallas interpreter (slow, correctness-only); on a
TPU it is the 181x-real-time path measured in docs/SCALING.md §1.
(Requires a transport with working device->host reads for the result
printout — the axon relay tunnel is not one; there, use bench.py's
trace-based timing instead.)
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
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture  # noqa: E402
from stm32f4_sdr_gps_tpu.track.scan import track_block      # noqa: E402
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
    epochs_n = 120 if on_cpu else 1000
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
    t0 = time.perf_counter()
    st, outs = jax.jit(
        lambda s, e: track_block(s, e, u2, plan, cfg))(st, epochs)
    jax.block_until_ready((st, outs))
    dt = time.perf_counter() - t0
    print(f"{epochs_n} epochs x {len(prns)} ch on "
          f"{jax.devices()[0].platform} in {dt:.1f} s "
          f"({'interpret mode' if on_cpu else 'native kernel'})")
    dop = np.asarray(outs.doppler_hz[-1])
    ip = np.asarray(np.abs(outs.ip[-10:])).mean(axis=0)  # |.|: nav bits flip IP's sign
    qp = np.asarray(np.abs(outs.qp[-10:])).mean(axis=0)
    print(" PRN   planted Dopp   tracked Dopp    err    |IP|/|QP|")
    for i, s in enumerate(sats):
        r = ip[i] / max(qp[i], 1e-9)
        print(f"  {s.prn:2d}   {s.doppler_hz:+10.1f}   {dop[i]:+10.1f}  "
              f"{dop[i]-s.doppler_hz:+7.2f}   {r:8.1f}")
        assert abs(dop[i] - s.doppler_hz) < 5.0, "tracking did not converge"
        assert r > 2.0, "prompt power not on the I arm (no carrier lock)"
    print("all channels converged")


if __name__ == "__main__":
    main()
