"""Benchmark: 32-channel tracking throughput on one TPU chip.

Prints ONE JSON line:
  metric      iq_samples_per_s_per_chip_32ch_tracking
  value       IQ stream samples/s sustained by the full 32-channel
              tracking pipeline (E/P/L + DLL/PLL/FLL + bit sync) on one
              chip (stream rate 2.046 MHz x real-time multiple)
  vs_baseline real-time multiple vs the reference firmware, which runs
              its 4-channel TDM pipeline at exactly 1.0x real time on a
              168 MHz STM32F407 (README.md:21, tracking.c:49).  The
              BASELINE.md target is >=100x at 32 channels.

Secondary numbers (acquisition cube time) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN, TrackConfig
    from stm32f4_sdr_gps_tpu.ops.correlate import code_fft_conj
    from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations
    from stm32f4_sdr_gps_tpu.acquire.engine import acquisition_power
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    plan = BASEBAND_PLAN
    cfg = TrackConfig()
    n_chan = 32
    block_epochs = 1000           # 1 s of signal per jitted call

    prns = [(i % 32) + 1 for i in range(n_chan)]
    table = jnp.asarray(ca_table_bipolar(prns))
    rng = np.random.default_rng(0)
    epochs = jnp.asarray(
        (rng.standard_normal((block_epochs, plan.samples_per_epoch))
         + 1j * rng.standard_normal((block_epochs, plan.samples_per_epoch))
         ).astype(np.complex64)
    )
    state = init_state(
        n_chan,
        rng.uniform(0, 1023, n_chan),
        rng.uniform(-5000, 5000, n_chan),
    )

    # NOTE: no buffer donation — donation hangs on the axon PJRT tunnel
    fn = jax.jit(lambda st, ep, tb: track_block(st, ep, tb, plan, cfg))
    # compile + warm
    state, outs = fn(state, epochs, table)
    jax.block_until_ready(outs.ip)

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, outs = fn(state, epochs, table)
        jax.block_until_ready(outs.ip)
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rt_multiple = (block_epochs * 1e-3) / wall
    samples_per_s = plan.sample_rate_hz * rt_multiple
    print(
        f"tracking: {block_epochs} epochs x {n_chan} ch in {wall * 1e3:.2f} ms"
        f" => {rt_multiple:.1f}x real-time",
        file=sys.stderr,
    )

    # acquisition secondary benchmark: 32 PRN x full grid x 10 epochs
    acq = AcqConfig()
    cfc = code_fft_conj(prns, plan)
    bins = jnp.asarray(np.asarray(acq.doppler_bins_hz, dtype=np.float32))
    rot = doppler_rotations(bins, plan.samples_per_epoch, plan.sample_rate_hz)
    acq_epochs = epochs[: acq.noncoherent_epochs]
    power = acquisition_power(acq_epochs, cfc, rot)
    power.block_until_ready()
    t0 = time.perf_counter()
    power = acquisition_power(acq_epochs, cfc, rot)
    power.block_until_ready()
    acq_wall = time.perf_counter() - t0
    print(
        f"acquisition: 32 PRN x {len(np.asarray(bins))} bins x "
        f"{acq.noncoherent_epochs} epochs in {acq_wall * 1e3:.1f} ms "
        f"({acq_wall / 32 * 1e3:.2f} ms/PRN; firmware: ~0.2 s/bin serial, "
        f"~58 s/PRN)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "iq_samples_per_s_per_chip_32ch_tracking",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rt_multiple, 2),
    }))


if __name__ == "__main__":
    main()
