"""Fine-grained TPU transport probe for the tracking-scan benchmark.

The round-1/2 axon tunnel misbehaves in several distinct ways
(async block_until_ready, UNIMPLEMENTED device->host, wedged claims).
bench.py's TPU attempt hangs somewhere inside one candidate path; this
probe runs ONE stage at a time with stderr flushes after every device
interaction so a `timeout`-killed run tells us exactly which op wedged.

Usage:
    timeout 240 python tools/tpu_probe.py <stage> [epochs]
stages:
    canary      - chained matmuls + block_until_ready
    gen         - on-device IQ PRNG generation
    compile     - lower+compile the jnp-scan track_block
    run-jnp     - compile + dispatch jnp-scan (NO block_until_ready)
    run-jnp-bur - same + block_until_ready
    trace-jnp   - dispatch under profiler trace, parse device events
    trace-epl   - same for the pallas-epl scan path
    trace-pk    - same for the pallas in-kernel scan
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import signal
import sys
import time

# sys.path[0] is tools/; the package lives one level up.  (Setting
# PYTHONPATH instead breaks the axon PJRT plugin registration.)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LAST = ["start"]


def log(msg):
    _LAST[0] = msg
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _alarm(signum, frame):  # noqa: ARG001
    # Self-watchdog: exit from inside the process (os._exit skips atexit /
    # buffer-claim teardown races) instead of being killed externally,
    # which wedges the axon tunnel for minutes (CLAUDE.md).
    print(f"[{time.strftime('%H:%M:%S')}] SELF-ALARM after stage: {_LAST[0]}",
          file=sys.stderr, flush=True)
    os._exit(3)


def main():
    stage = sys.argv[1]
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    budget = int(os.environ.get("PROBE_BUDGET_S", "420"))
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compile cache: tunnel-side compiles are slow and highly
    # variable (52 s .. >280 s for the same 200-epoch scan), so make any
    # successful compile reusable by every later short-lived process.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    log(f"jax imported; stage={stage} epochs={n_epochs}")
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    if stage == "canary":
        x = jnp.zeros((8192, 8192), jnp.float32) + 1e-3
        f = jax.jit(lambda a: a @ a * 1e-4)
        y = f(x)
        log("canary dispatched")
        jax.block_until_ready(y)
        log("canary block_until_ready returned")
        return

    from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import track_block_pallas
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    plan = BASEBAND_PLAN
    n_chan = 32
    prns = [(i % 32) + 1 for i in range(n_chan)]
    table_np = ca_table_bipolar(prns)
    rng = np.random.default_rng(0)
    state0 = init_state(
        n_chan, rng.uniform(0, 1023, n_chan), rng.uniform(-5000, 5000, n_chan)
    )
    log("host state built")

    @jax.jit
    def _make_epochs(key):
        kr, ki = jax.random.split(key)
        shape = (n_epochs, plan.samples_per_epoch)
        return (jax.random.normal(kr, shape, dtype=jnp.float32)
                + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))

    epochs = _make_epochs(jax.random.PRNGKey(0))
    log("IQ dispatch returned")
    if stage == "gen":
        jax.block_until_ready(epochs)
        log("IQ block_until_ready returned")
        return

    # explicit False: these stages measure the jnp / epl variants (the
    # backend-aware default would auto-route to the in-kernel scan)
    cfg = TrackConfig(in_kernel_scan=False)
    if stage in ("compile", "run-jnp", "run-jnp-bur", "trace-jnp"):
        table = jnp.asarray(table_np)
        log("code table transferred")
        fn = jax.jit(lambda st, ep: track_block(st, ep, table, plan, cfg))
    elif stage == "trace-epl":
        u2 = jnp.asarray(upsampled_code_doubled(table_np))
        log("u2 table transferred")
        cfg_epl = TrackConfig(use_pallas=True, in_kernel_scan=False)
        fn = jax.jit(lambda st, ep: track_block(st, ep, u2, plan, cfg_epl))
    elif stage == "trace-pk":
        u2 = jnp.asarray(upsampled_code_doubled(table_np))
        log("u2 table transferred")
        fn = jax.jit(
            lambda st, ep: track_block_pallas(st, ep, u2, plan, cfg))
    else:
        raise SystemExit(f"unknown stage {stage}")

    t0 = time.perf_counter()
    fn = fn.lower(state0, epochs).compile()
    log(f"compiled in {time.perf_counter() - t0:.1f}s")
    if stage == "compile":
        return

    if stage in ("run-jnp", "run-jnp-bur"):
        st, outs = fn(state0, epochs)
        log("dispatch returned")
        if stage == "run-jnp-bur":
            jax.block_until_ready((st, outs))
            log("block_until_ready returned")
        return

    # trace-* stages: dispatch N chained blocks under a profiler trace;
    # never block on the result — sleep a bounded window instead.
    trace_dir = "/tmp/tpu_probe_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    n_blocks = 4
    jax.profiler.start_trace(trace_dir)
    log("trace started")
    st = state0
    for i in range(n_blocks):
        st, outs = fn(st, epochs)
        log(f"block {i} dispatched")
    try:
        jax.block_until_ready((st, outs))
        log("chain block_until_ready returned")
    except Exception as e:  # noqa: BLE001
        log(f"chain block_until_ready raised {type(e).__name__}: {e}")
    time.sleep(4.0)
    jax.profiler.stop_trace()
    log("trace stopped")
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        log("NO trace file")
        return
    data = json.loads(gzip.open(files[-1]).read())
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_ev = [e for e in ev
              if e.get("ph") == "X"
              and "TPU" in str(pids.get(e.get("pid"), ""))]
    log(f"{len(dev_ev)} device events")
    top = {}
    for e in dev_ev:
        nm = str(e.get("name", ""))
        top[nm] = top.get(nm, 0) + e["dur"]
    for nm, us in sorted(top.items(), key=lambda kv: -kv[1])[:12]:
        log(f"  {us/1e3:10.2f} ms  {nm}")
    jit_s = sum(us for nm, us in top.items() if nm.startswith("jit_")) / 1e6
    rt = n_blocks * n_epochs * 1e-3 / jit_s if jit_s else 0.0
    log(f"jit device time {jit_s*1e3:.1f} ms => {rt:.1f}x real-time")


if __name__ == "__main__":
    main()
