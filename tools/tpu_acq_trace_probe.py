"""Diagnostic: trace an acquisition program and a tracking program in
the SAME jax.profiler window on the axon tunnel.

Observed r2: tracking programs produce device trace events; every
acquisition child's trace comes back empty with an async
profiler_controller UNIMPLEMENTED.  This probe disambiguates
session-level vs program-level failure: if the combined trace shows
jit_track events but no jit_acq events, the acquisition program itself
never executes (or its events are dropped); if both appear, the
acq-child sequencing was the problem and the acq number is measurable
in-window.
"""
import glob
import gzip
import json
import os
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.acquire.engine import acquisition_power  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.correlate import (
    code_spectrum_conj_matmul, dft_tables_device, pack_code_bits,
    unpack_code_table)  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import track_block_pallas  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


plan = BASEBAND_PLAN
acq = AcqConfig()
prns = list(range(1, 33))
dev = jax.devices()[0]
log(f"device: {dev}")

# ---- tracking program (known to trace) --------------------------------
table_np = ca_table_bipolar(prns)
rng = np.random.default_rng(0)
state0 = init_state(32, rng.uniform(0, 1023, 32), rng.uniform(-5e3, 5e3, 32))
u2 = jnp.asarray(upsampled_code_doubled(table_np))
cfg = TrackConfig()
track_fn = jax.jit(lambda st, ep: track_block_pallas(st, ep, u2, plan, cfg))


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def _make(key, n):
    kr, ki = jax.random.split(key)
    shape = (n, plan.samples_per_epoch)
    return (jax.random.normal(kr, shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))


track_epochs = _make(jax.random.PRNGKey(0), n=200)
jax.block_until_ready(track_epochs)

t0 = time.perf_counter()
track_fn = track_fn.lower(state0, track_epochs).compile()
log(f"track compiled in {time.perf_counter()-t0:.1f}s")
st, outs = track_fn(state0, track_epochs)
jax.block_until_ready((st, outs))
log("track warm-up synced")

# ---- acquisition program (matmul DFT) ---------------------------------
from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations
s_len = plan.samples_per_epoch
packed = pack_code_bits(prns, plan)
bins = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
table_d = unpack_code_table(jax.device_put(packed), s_len)
rot_d = jax.jit(doppler_rotations, static_argnums=(1, 2))(
    jax.device_put(bins), s_len, plan.sample_rate_hz)
wc, ws = dft_tables_device(s_len)
cfc_d = code_spectrum_conj_matmul(table_d, wc, ws)
# reduced output: the full (P, D, S) cube is 7.6 MB; hypothesis is the
# tunnel profiler fails on large-output programs (tracking outputs are
# small and trace fine) — reduce to per-(P, D) peak power + lag
def _acq_reduced(e, c, r, w0, w1):
    cube = acquisition_power(e, c, r, dft=(w0, w1))
    return jnp.max(cube, axis=-1), jnp.argmax(cube, axis=-1)


acq_fn = jax.jit(_acq_reduced)
acq_epochs = _make(jax.random.PRNGKey(1), n=int(acq.noncoherent_epochs))
args = (acq_epochs, cfc_d, rot_d, wc, ws)
t0 = time.perf_counter()
acq_fn = acq_fn.lower(*args).compile()
log(f"acq compiled in {time.perf_counter()-t0:.1f}s")
p = acq_fn(*args)
jax.block_until_ready(p)
log("acq warm-up synced")

# ---- combined trace ----------------------------------------------------
trace_dir = "/tmp/acq_trace_probe"
import shutil
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
s = state0
s, o = track_fn(s, track_epochs)
for _ in range(4):
    p = acq_fn(*args)
s, o = track_fn(s, track_epochs)
time.sleep(3.0)
jax.profiler.stop_trace()
log("trace stopped")

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
    cnt, tot = agg.get(nm, (0, 0.0))
    agg[nm] = (cnt + 1, tot + e["dur"] / 1e6)
for nm, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:15]:
    log(f"  {tot*1e3:10.2f} ms x{cnt:3d}  {nm}")
if not agg:
    log("no TPU device events at all")
