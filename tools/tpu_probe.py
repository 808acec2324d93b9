"""Transport health probe: device op + profiler trace in one short-lived
process.  Exits 0 = healthy window (trace timing available), 1 = device
ops fail, 3 = hang (self-alarm).  Never killed externally (CLAUDE.md:
killing a client mid-claim wedges the tunnel).
"""
import glob
import gzip
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "import"


def _alarm(sig, frm):
    print(f"PROBE ALARM in {STAGE}", flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)
signal.alarm(180)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import shutil  # noqa: E402

dev = jax.devices()[0]
print("device:", dev, flush=True)

STAGE = "matmul"
signal.alarm(120)
x = jnp.asarray(np.random.default_rng(0).standard_normal((512, 512))
                .astype(np.float32))
f = jax.jit(lambda a: a @ a)
try:
    jax.block_until_ready(f(x))
except Exception as e:  # noqa: BLE001
    print(f"matmul FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
    os._exit(1)
print("matmul ok", flush=True)

STAGE = "trace"
signal.alarm(300)
td = "/tmp/probe_trace"
shutil.rmtree(td, ignore_errors=True)
try:
    jax.profiler.start_trace(td)
    for _ in range(4):
        y = f(x)
    jax.block_until_ready(y)
    time.sleep(1.0)
    jax.profiler.stop_trace()
except Exception as e:  # noqa: BLE001
    print(f"trace FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
    os._exit(1)
files = sorted(glob.glob(td + "/**/*.trace.json.gz", recursive=True))
if not files:
    print("trace produced no file", flush=True)
    os._exit(1)
data = json.loads(gzip.open(files[-1]).read())
ev = data.get("traceEvents", [])
pids = {e["pid"]: e["args"].get("name") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
n_dev = sum(1 for e in ev if e.get("ph") == "X"
            and "TPU" in str(pids.get(e.get("pid"), "")))
print(f"trace ok: {n_dev} device events", flush=True)
os._exit(0 if n_dev else 1)
