"""Trace the Receiver's production jit unit on the TPU: the single
track_block(in_kernel_scan) + digest_block program (_track_and_digest).

This is the program a device-resident receiver dispatches per block —
its digest output is ~kB, so it satisfies the tunnel profiler's
small-output requirement (CLAUDE.md).

Usage: python tools/digest_probe.py [block_epochs] [n_chan]
"""
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

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.runtime.receiver import _track_and_digest  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


block_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
n_chan = int(sys.argv[2]) if len(sys.argv) > 2 else 32
log(f"block_epochs={block_epochs} n_chan={n_chan}")

plan = BASEBAND_PLAN
cfg = TrackConfig(in_kernel_scan=True)
prns = [(i % 32) + 1 for i in range(n_chan)]
u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar(prns)))
rng = np.random.default_rng(0)
state0 = init_state(n_chan, rng.uniform(0, 1023, n_chan),
                    rng.uniform(-5e3, 5e3, n_chan))


@jax.jit
def _make(key):
    kr, ki = jax.random.split(key)
    shape = (block_epochs, plan.samples_per_epoch)
    return (jax.random.normal(kr, shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))


epochs = _make(jax.random.PRNGKey(0))
jax.block_until_ready(epochs)
fn = jax.jit(lambda st, ep: _track_and_digest(
    st, ep, u2, plan, cfg, 8, True))
t0 = time.perf_counter()
fn = fn.lower(state0, epochs).compile()
log(f"compiled in {time.perf_counter()-t0:.1f}s")
st, d = fn(state0, epochs)
jax.block_until_ready((st, d))
log("warm-up synced")

trace_dir = "/tmp/digest_probe_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
s = state0
for _ in range(4):
    s, d = fn(s, epochs)
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
    if not nm.startswith("jit_"):
        continue
    cnt, tot = agg.get(nm, (0, 0.0))
    agg[nm] = (cnt + 1, tot + e["dur"] / 1e6)
if not agg:
    log("no jit_ device events")
    sys.exit(1)
name, (cnt, tot) = max(agg.items(), key=lambda kv: kv[1][1])
rt = cnt * block_epochs * 1e-3 / tot
log(f"{name}: {cnt} execs, {tot*1e3:.2f} ms device "
    f"=> {tot/cnt/block_epochs*1e6:.2f} us/epoch => {rt:.1f}x real-time "
    f"(track + digest, the receiver's per-block program)")
