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

Measurement integrity: some remote-TPU transports report arrays "ready"
before execution finishes, which silently voids wall-clock timing.  The
benchmark first runs a FLOP-floor canary (chained large matmuls whose
minimum time is known from hardware peak); if the apparent FLOP/s is
impossible, wall clock is rejected and the benchmark times the device
with jax.profiler trace events (device-reported durations); if tracing
is unavailable too, it falls back to an honest CPU run and says so.
"""

from __future__ import annotations

import glob
import gzip
import json
import multiprocessing
import os
import shutil
import sys
import time

import numpy as np

PROBE_TIMEOUT_S = 120
# Anything beyond this is physically impossible for one chip of any
# current TPU generation in f32 — used to detect fake synchronization.
MAX_PLAUSIBLE_TFLOPS = 500.0


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


def wall_clock_is_honest() -> bool:
    """FLOP-floor canary: chain of 8192^3 f32 matmuls (1.1 TFLOP each)."""
    import jax
    import jax.numpy as jnp

    n = 20
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8192, 8192))
        .astype(np.float32)
    ) * 1e-3

    @jax.jit
    def step(a):
        return a @ a * 1e-4

    a = step(x)
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    a = x
    for _ in range(n):
        a = step(a)
    jax.block_until_ready(a)
    wall = time.perf_counter() - t0
    tflops = n * 2 * 8192**3 / wall / 1e12
    honest = tflops <= MAX_PLAUSIBLE_TFLOPS
    print(
        f"sync canary: {n} matmuls in {wall * 1e3:.1f} ms => "
        f"{tflops:.1f} apparent TFLOP/s => wall clock "
        f"{'HONEST' if honest else 'NOT trustworthy (async transport)'}",
        file=sys.stderr,
    )
    return honest


def _device_trace_seconds(run_fn, name_hint: str = "jit_"):
    """Run ``run_fn`` under a jax.profiler trace; return summed device
    event seconds for top-level jitted functions, or None."""
    import jax

    trace_dir = "/tmp/bench_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    try:
        jax.profiler.start_trace(trace_dir)
        run_fn()
        time.sleep(2.0)   # let remote execution drain before stop
        jax.profiler.stop_trace()
    except Exception as e:  # noqa: BLE001
        print(f"profiler trace failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace file produced", file=sys.stderr)
        return None
    data = json.loads(gzip.open(files[-1]).read())
    ev = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [
        e for e in ev
        if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), ""))
        and str(e.get("name", "")).startswith(name_hint)
    ]
    if not dev:
        print("no device events in trace", file=sys.stderr)
        return None
    return sum(e["dur"] for e in dev) / 1e6


def run_bench() -> bool:
    import jax
    import jax.numpy as jnp

    from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN, TrackConfig
    from stm32f4_sdr_gps_tpu.ops.correlate import code_fft_conj
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import track_block_pallas
    from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations
    from stm32f4_sdr_gps_tpu.acquire.engine import acquisition_power
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    dev = jax.devices()[0]
    platform = dev.platform
    print(f"device: {dev} ({platform})", file=sys.stderr)

    plan = BASEBAND_PLAN
    n_chan = 32

    prns = [(i % 32) + 1 for i in range(n_chan)]
    table_np = ca_table_bipolar(prns)
    table = jnp.asarray(table_np)
    u2 = jnp.asarray(upsampled_code_doubled(table_np))
    rng = np.random.default_rng(0)

    # BENCH_ASSUME_ASYNC=1 skips the canary and goes straight to
    # device-reported trace timing (for harvest retries on a transport
    # already proven async — the 268 MB canary transfer is pure load).
    if platform != "cpu" and os.environ.get("BENCH_ASSUME_ASYNC") == "1":
        print("assuming async transport (BENCH_ASSUME_ASYNC=1); "
              "using trace timing", file=sys.stderr)
        honest_wall = False
    else:
        honest_wall = platform == "cpu" or wall_clock_is_honest()

    block_epochs = int(os.environ.get("BENCH_BLOCK_EPOCHS", "2000"))
    # Generate the IQ block ON DEVICE (throughput is input-independent —
    # noise exercises the identical compute).  The previous host
    # jnp.asarray pushed ~33 MB through the transport, which some remote
    # PJRT tunnels reject with UNIMPLEMENTED; PRNG generation needs only
    # a 2-word key transfer.
    @jax.jit
    def _make_epochs(key):
        kr, ki = jax.random.split(key)
        shape = (block_epochs, plan.samples_per_epoch)
        return (jax.random.normal(kr, shape, dtype=jnp.float32)
                + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))

    epochs = _make_epochs(jax.random.PRNGKey(0))
    try:
        jax.block_until_ready(epochs)
        print(f"IQ block generated on device: {block_epochs} epochs",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"on-device IQ generation failed: {type(e).__name__}: "
              f"{str(e)[:160]}", file=sys.stderr)
        return False
    state0 = init_state(
        n_chan,
        rng.uniform(0, 1023, n_chan),
        rng.uniform(-5000, 5000, n_chan),
    )

    # Candidate tracking paths.  The headline metric is the FASTEST
    # verified path (all three are equivalence-tested against each
    # other in tests/test_pallas_scan.py / test_pallas.py).  Pallas
    # paths only run natively (interpret mode on CPU measures the
    # emulator, not the framework).
    # NOTE: no buffer donation — donation hangs on some remote transports
    cfg_jnp = TrackConfig()
    cfg_epl = TrackConfig(use_pallas=True)
    candidates = [
        ("jnp-scan",
         jax.jit(lambda st, ep: track_block(st, ep, table, plan, cfg_jnp))),
    ]
    if platform != "cpu":
        candidates += [
            ("pallas-epl-scan",
             jax.jit(lambda st, ep: track_block(st, ep, u2, plan, cfg_epl))),
            ("pallas-in-kernel-scan",
             jax.jit(lambda st, ep: track_block_pallas(
                 st, ep, u2, plan, cfg_jnp))),
        ]
    # BENCH_PATHS=comma,list restricts candidates so a flaky remote
    # transport can try one path per short-lived process (a failed op
    # usually poisons every later op in the same client).
    only = os.environ.get("BENCH_PATHS")
    if only:
        keep = {s.strip() for s in only.split(",")}
        candidates = [c for c in candidates if c[0] in keep]

    method = None
    best = None      # (rt_multiple, name)
    for name, fn in candidates:
        # compile and warm-up as separate stages so a transport failure
        # is attributable (compile happens host/server-side; the first
        # run exercises transfer + execution)
        try:
            fn = fn.lower(state0, epochs).compile()
            print(f"tracking[{name}]: compiled", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"tracking[{name}]: COMPILE failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            continue
        try:
            st, outs = fn(state0, epochs)    # warm up
            jax.block_until_ready((st, outs))
        except Exception as e:  # noqa: BLE001
            print(f"tracking[{name}]: RUN failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            continue
        rt = None
        if honest_wall:
            n_blocks = 8 if platform == "cpu" else 64
            t0 = time.perf_counter()
            st = state0
            for _ in range(n_blocks):
                st, outs = fn(st, epochs)
            jax.block_until_ready((st, outs))
            wall = time.perf_counter() - t0
            rt = n_blocks * block_epochs * 1e-3 / wall
            method = "wall-clock chain"
        else:
            n_blocks = 4

            def chain():
                s = state0
                for _ in range(n_blocks):
                    s, o = fn(s, epochs)
                jax.block_until_ready((s, o))

            dev_s = _device_trace_seconds(chain)
            if dev_s is not None and dev_s > 0:
                rt = n_blocks * block_epochs * 1e-3 / dev_s
                method = "profiler device trace"
        if rt is None:
            print(f"tracking[{name}]: no trustworthy timing",
                  file=sys.stderr)
            continue
        print(
            f"tracking[{name}] ({method}): {n_blocks}x{block_epochs} "
            f"epochs x {n_chan} ch => {rt:.1f}x real-time",
            file=sys.stderr,
        )
        if best is None or rt > best[0]:
            best = (rt, name)

    if best is None:
        print("no trustworthy device timing available", file=sys.stderr)
        return False

    rt_multiple, best_name = best
    samples_per_s = plan.sample_rate_hz * rt_multiple
    print(f"headline path: {best_name}", file=sys.stderr)

    print(json.dumps({
        "metric": "iq_samples_per_s_per_chip_32ch_tracking",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rt_multiple, 2),
    }))
    sys.stdout.flush()

    # acquisition secondary benchmark (same timing discipline); failures
    # here must not discard the tracking headline already printed
    try:
        acq = AcqConfig()
        cfc = code_fft_conj(prns, plan)
        bins_host = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
        rot = doppler_rotations(jnp.asarray(bins_host),
                                plan.samples_per_epoch, plan.sample_rate_hz)
        acq_epochs = epochs[: acq.noncoherent_epochs]
        power = acquisition_power(acq_epochs, cfc, rot)
        power.block_until_ready()
        if honest_wall:
            t0 = time.perf_counter()
            for _ in range(5):
                power = acquisition_power(acq_epochs, cfc, rot)
            power.block_until_ready()
            acq_s = (time.perf_counter() - t0) / 5
        else:
            acq_s = _device_trace_seconds(
                lambda: jax.block_until_ready(
                    acquisition_power(acq_epochs, cfc, rot))
            )
        if acq_s:
            print(
                f"acquisition: 32 PRN x {len(bins_host)} bins x "
                f"{acq.noncoherent_epochs} epochs in {acq_s * 1e3:.1f} ms "
                f"({acq_s / 32 * 1e3:.2f} ms/PRN; firmware: ~0.2 s/bin "
                f"serial => ~58 s/PRN)",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001
        print(f"acquisition bench skipped: {type(e).__name__}: "
              f"{str(e)[:160]}", file=sys.stderr)
    return True


def _cpu_fallback():
    print(
        "falling back to CPU (fallback numbers are NOT a TPU result)",
        file=sys.stderr,
    )
    env = dict(os.environ)
    env["BENCH_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # skip plugin registration
    os.execve(sys.executable, [sys.executable, __file__], env)


TPU_ATTEMPT_TIMEOUT_S = 420


def main():
    force_cpu = os.environ.get("BENCH_FORCE_CPU") == "1"
    attempt = os.environ.get("BENCH_TPU_ATTEMPT") == "1"

    if force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.exit(0 if run_bench() else 1)

    if attempt:
        # child process: one full TPU attempt, no fallback
        if not device_available():
            sys.exit(2)
        sys.exit(0 if run_bench() else 1)

    # parent: run the TPU attempt under a hard watchdog (a wedged remote
    # transport can hang any device op indefinitely), else CPU fallback.
    import subprocess

    env = dict(os.environ)
    env["BENCH_TPU_ATTEMPT"] = "1"
    try:
        rc = subprocess.run(
            [sys.executable, __file__],
            env=env,
            timeout=TPU_ATTEMPT_TIMEOUT_S,
        ).returncode
    except subprocess.TimeoutExpired:
        print("TPU attempt timed out", file=sys.stderr)
        rc = -1
    if rc == 0:
        return
    _cpu_fallback()


if __name__ == "__main__":
    main()
