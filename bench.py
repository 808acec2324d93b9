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

Secondary numbers (block-length sweep, acquisition cube time) go to
stderr.  If the TPU device is unreachable (the axon tunnel can wedge
after a killed client), the benchmark re-runs itself on CPU and reports
that honestly on stderr — the JSON schema stays the same.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time

import numpy as np

PROBE_TIMEOUT_S = 120


def _probe_device(q):
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.arange(16.0) + 1
        jax.block_until_ready(x)
        q.put(str(jax.devices()[0]))
    except Exception as e:  # noqa: BLE001
        q.put(f"ERROR: {e}")


def device_available() -> bool:
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_device, args=(q,))
    p.start()
    p.join(PROBE_TIMEOUT_S)
    if p.is_alive():
        p.terminate()
        p.join()
        print("device probe timed out", file=sys.stderr)
        return False
    msg = q.get() if not q.empty() else "no response"
    print(f"device probe: {msg}", file=sys.stderr)
    return not msg.startswith("ERROR")


def run_bench():
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
    platform = dev.platform
    print(f"device: {dev} ({platform})", file=sys.stderr)

    plan = BASEBAND_PLAN
    cfg = TrackConfig()
    n_chan = 32

    prns = [(i % 32) + 1 for i in range(n_chan)]
    table = jnp.asarray(ca_table_bipolar(prns))
    rng = np.random.default_rng(0)

    def timed_chain(block_epochs, n_blocks, track_cfg, code_table):
        """Sustained throughput over a long *dependent* chain of tracking
        blocks (state feeds forward).  Single-call timings on the axon
        tunnel are distorted by async dispatch; a chain is bounded by
        true device execution via queue backpressure."""
        epochs = jnp.asarray(
            (rng.standard_normal((block_epochs, plan.samples_per_epoch))
             + 1j * rng.standard_normal((block_epochs,
                                         plan.samples_per_epoch))
             ).astype(np.complex64)
        )
        state = init_state(
            n_chan,
            rng.uniform(0, 1023, n_chan),
            rng.uniform(-5000, 5000, n_chan),
        )
        # NOTE: no buffer donation — donation hangs on the axon tunnel
        fn = jax.jit(lambda st, ep, tb: track_block(
            st, ep, tb, plan, track_cfg))
        st, outs = fn(state, epochs, code_table)
        jax.block_until_ready((st, outs))
        t0 = time.perf_counter()
        st = state
        for _ in range(n_blocks):
            st, outs = fn(st, epochs, code_table)
        jax.block_until_ready((st, outs))
        return time.perf_counter() - t0

    # chain-length sweep shows dispatch-latency amortization
    for n_blocks in (1, 16, 64):
        wall = timed_chain(500, n_blocks, cfg, table)
        ep = 500 * n_blocks
        print(
            f"tracking chain: {n_blocks} x 500 epochs x {n_chan} ch in "
            f"{wall * 1e3:.2f} ms => {ep * 1e-3 / wall:.0f}x realtime",
            file=sys.stderr,
        )

    n_blocks, block_epochs = 128, 500
    wall = timed_chain(block_epochs, n_blocks, cfg, table)
    total_epochs = n_blocks * block_epochs
    rt_multiple = (total_epochs * 1e-3) / wall
    samples_per_s = plan.sample_rate_hz * rt_multiple
    print(
        f"tracking: {total_epochs} epochs x {n_chan} ch in "
        f"{wall * 1e3:.2f} ms => {rt_multiple:.1f}x real-time",
        file=sys.stderr,
    )

    # Pallas fused-correlator backend comparison
    try:
        from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
        from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar as _ct

        u2 = jnp.asarray(upsampled_code_doubled(_ct(prns)))
        cfg_pl = TrackConfig(use_pallas=True)
        wall_pl = timed_chain(block_epochs, 64, cfg_pl, u2)
        rt_pl = (64 * block_epochs * 1e-3) / wall_pl
        print(
            f"tracking (pallas EPL): {64 * block_epochs} epochs in "
            f"{wall_pl * 1e3:.2f} ms => {rt_pl:.1f}x real-time",
            file=sys.stderr,
        )
        if rt_pl > rt_multiple:
            rt_multiple = rt_pl
            samples_per_s = plan.sample_rate_hz * rt_pl
            print("using pallas backend result", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"pallas backend failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # acquisition secondary benchmark: 32 PRN x full grid x 10 epochs
    acq = AcqConfig()
    cfc = code_fft_conj(prns, plan)
    bins_host = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
    rot = doppler_rotations(jnp.asarray(bins_host), plan.samples_per_epoch,
                            plan.sample_rate_hz)
    acq_epochs = jnp.asarray(
        (rng.standard_normal((acq.noncoherent_epochs,
                              plan.samples_per_epoch))
         + 1j * rng.standard_normal((acq.noncoherent_epochs,
                                     plan.samples_per_epoch))
         ).astype(np.complex64)
    )
    power = acquisition_power(acq_epochs, cfc, rot)
    power.block_until_ready()
    t0 = time.perf_counter()
    power = acquisition_power(acq_epochs, cfc, rot)
    power.block_until_ready()
    acq_wall = time.perf_counter() - t0
    print(
        f"acquisition: 32 PRN x {len(bins_host)} bins x "
        f"{acq.noncoherent_epochs} epochs in {acq_wall * 1e3:.1f} ms "
        f"({acq_wall / 32 * 1e3:.2f} ms/PRN; firmware: ~0.2 s/bin "
        f"serial => ~58 s/PRN)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "iq_samples_per_s_per_chip_32ch_tracking",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rt_multiple, 2),
    }))


def main():
    if os.environ.get("BENCH_FORCE_CPU") != "1" and not device_available():
        print(
            "TPU unreachable — re-running benchmark on CPU (fallback; "
            "numbers are NOT the TPU result)",
            file=sys.stderr,
        )
        env = dict(os.environ)
        env["BENCH_FORCE_CPU"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""   # skip plugin registration
        os.execve(sys.executable, [sys.executable, __file__], env)
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_bench()


if __name__ == "__main__":
    main()
