"""Measure the in-kernel tracking scan at a given EPB (epochs per grid
step) on the TPU: compile, trace, print device-time real-time multiple.

Usage: python tools/epb_probe.py [EPB] [block_epochs] [n_chan]
Self-alarmed (never kill externally — tunnel rules in CLAUDE.md).

ONE EPB value per process: EPB is a module constant read at trace
time and is NOT part of any jit cache key, so re-tracing with a second
value in the same process would silently reuse the first compilation.
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
from stm32f4_sdr_gps_tpu.ops import pallas_track_scan as pts  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


epb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
block_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
n_chan = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ablate = sys.argv[4] if len(sys.argv) > 4 else ""
pts.EPB = epb
coh = os.environ.get("PROBE_COHERENT") == "1"
log(f"EPB={epb} block_epochs={block_epochs} n_chan={n_chan} "
    f"coherent={coh} ablate={ablate!r}")

plan = BASEBAND_PLAN
if coh:
    from stm32f4_sdr_gps_tpu.config import COHERENT_TRACK
    cfg = COHERENT_TRACK
else:
    cfg = TrackConfig()
if ablate == "unroll":
    pts.UNROLL = True
    ablate = ""
elif ablate:
    import dataclasses
    cfg = dataclasses.replace(cfg, ablate=ablate)
prns = [(i % 32) + 1 for i in range(n_chan)]
table_np = ca_table_bipolar(prns)
rng = np.random.default_rng(0)
state0 = init_state(n_chan, rng.uniform(0, 1023, n_chan),
                    rng.uniform(-5e3, 5e3, n_chan),
                    window=cfg.pll_check_window)
u2 = jnp.asarray(upsampled_code_doubled(table_np))


@jax.jit
def _make(key):
    kr, ki = jax.random.split(key)
    shape = (block_epochs, plan.samples_per_epoch)
    return (jax.random.normal(kr, shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))


epochs = _make(jax.random.PRNGKey(0))
jax.block_until_ready(epochs)
fn = jax.jit(lambda st, ep: pts.track_block_pallas(st, ep, u2, plan, cfg))
t0 = time.perf_counter()
fn = fn.lower(state0, epochs).compile()
log(f"compiled in {time.perf_counter()-t0:.1f}s")
st, outs = fn(state0, epochs)
jax.block_until_ready((st, outs))
log("warm-up synced")

trace_dir = "/tmp/epb_probe_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
s = state0
for _ in range(4):
    s, o = fn(s, epochs)
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
    f"=> {rt*n_chan:.0f} channel-ms/ms aggregate")
