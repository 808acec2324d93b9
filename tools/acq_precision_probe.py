"""Measure the acquisition cube at a given matmul-DFT precision.

Usage: python tools/acq_precision_probe.py [highest|default|bf16x3]
Traces the production reduced program (cube + device peak analysis) on
the TPU and prints device time; self-alarmed per the tunnel rules.
"""
import functools
import glob
import gzip
import json
import os
import shutil
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _alarm(sig, frm):
    print("ALARM — self-exit", flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)
signal.alarm(560)

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
import numpy as np             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN  # noqa: E402
from stm32f4_sdr_gps_tpu.acquire.engine import (  # noqa: E402
    acquisition_power, analyze_power_device, exclusion_lags)
from stm32f4_sdr_gps_tpu.ops.correlate import (  # noqa: E402
    code_spectrum_conj_matmul, dft_tables_device, pack_code_bits,
    unpack_code_table)
from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations  # noqa: E402

prec_name = sys.argv[1] if len(sys.argv) > 1 else "highest"
prec = {"highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "bf16x3": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3}[prec_name]


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


plan = BASEBAND_PLAN
acq = AcqConfig(
    noncoherent_epochs=int(os.environ.get("PROBE_ACQ_EPOCHS", "10")),
    coherent_epochs=int(os.environ.get("PROBE_ACQ_COHERENT", "1")),
    doppler_step_hz=float(os.environ.get("PROBE_ACQ_STEP", "500")),
)
s = plan.samples_per_epoch
prns = list(range(1, 33))
packed = pack_code_bits(prns, plan)
bins_host = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
table_d = unpack_code_table(jax.device_put(packed), s)
rot_d = jax.jit(doppler_rotations, static_argnums=(1, 2))(
    jax.device_put(bins_host), s, plan.sample_rate_hz)


@jax.jit
def _make(key):
    kr, ki = jax.random.split(key)
    shape = (acq.noncoherent_epochs, plan.samples_per_epoch)
    return (jax.random.normal(kr, shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))


acq_epochs = _make(jax.random.PRNGKey(1))
bins_d = jax.device_put(bins_host)
excl = exclusion_lags(acq, plan)
dft_d = dft_tables_device(s)
cfc_d = code_spectrum_conj_matmul(table_d, *dft_d)
power_fn = jax.jit(lambda e, c, r, b, w0, w1: analyze_power_device(
    acquisition_power(e, c, r, coherent=acq.coherent_epochs, dft=(w0, w1),
                      dft_precision=prec),
    b, excl))
args = (acq_epochs, cfc_d, rot_d, bins_d) + dft_d
t0 = time.perf_counter()
power_fn = power_fn.lower(*args).compile()
log(f"acq[{prec_name}]: compiled in {time.perf_counter()-t0:.1f}s")
p = power_fn(*args)
jax.block_until_ready(p)
log("warm-up synced")

trace_dir = "/tmp/acq_prec_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
for _ in range(4):
    p = power_fn(*args)
time.sleep(3.0)
jax.profiler.stop_trace()
files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
if not files:
    log("NO trace file")
    sys.exit(1)
data = json.loads(gzip.open(files[-1]).read())
ev = data.get("traceEvents", [])
pids = {e["pid"]: e["args"].get("name") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
agg = {}
for e in ev:
    if e.get("ph") != "X" or "TPU" not in str(pids.get(e.get("pid"), "")):
        continue
    nm = str(e.get("name", ""))
    if not nm.startswith("jit_"):
        continue
    cnt, tot = agg.get(nm, (0, 0.0))
    agg[nm] = (cnt + 1, tot + e["dur"] / 1e6)
if not agg:
    log("no jit_ device events")
    sys.exit(1)
name, (cnt, tot) = max(agg.items(), key=lambda kv: kv[1][1])
log(f"acq[{prec_name}] {name}: {cnt} execs, {tot/cnt*1e3:.1f} ms/cube "
    f"({tot/cnt*1e3/32:.3f} ms/PRN)")
