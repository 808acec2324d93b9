"""Probe 3: layout decisions for the tracking-kernel redesign.

Measures, per inner iteration:
  tr6      transpose (6, C, 1) -> (6, 1, C)        [corr outputs to lanes]
  tr2      transpose (2, 1, C) -> (2, C, 1)        [cp/dop row mirror]
  wide_row 14 wide passes on (C, SP) row-major      [wipeoff cost model]
  wide_col 14 wide passes on (SP, C) lane-major
  red_row  6x (mul + lane-reduce)   (C, SP) -> (C, 1)
  red_col  6x (mul + sublane-reduce) (SP, C) -> (1, C)
  roll_row static roll+select barrel (4 stages) on (C, SP)
  roll_col static roll+select barrel (4 stages) on (SP, C), sublane axis

Usage: python tools/forest_probe3.py [C]
Self-alarmed (tunnel rules in CLAUDE.md).
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
signal.alarm(570)

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
import numpy as np             # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


C = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SP = 2048
G = 128
EPOCHS = 8
f32 = jnp.float32


def build(variant):
    if "col" in variant:
        wshp = (SP, C)
        raxis = 0
    else:
        wshp = (C, SP)
        raxis = 1
    sshp = (8, C, 1) if variant == "tr6" else (8, 1, C)

    def kernel(x_init, w_init, out_ref, st, wst):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            st[...] = x_init[...]
            wst[...] = w_init[...]

        def body(ei, _):
            v = st[...]
            if variant == "tr6":
                t = jax.lax.transpose(v[0:6], (0, 2, 1))  # (6,1,C)
                st[0:6] = jax.lax.transpose(
                    t * f32(1.000001), (0, 2, 1))
            elif variant == "tr2":
                t = jax.lax.transpose(v[0:2], (0, 2, 1))  # (2,C,1)
                st[0:2] = jax.lax.transpose(
                    t * f32(1.000001), (0, 2, 1))
            elif variant.startswith("wide"):
                w = wst[...]
                a = w
                for _ in range(7):
                    a = a * f32(1.000001) + w
                    a = a * f32(0.999999) - w
                wst[...] = a
            elif variant.startswith("red"):
                w = wst[...]
                acc = []
                for j in range(6):
                    acc.append(jnp.sum(w * (w + f32(j)), axis=raxis,
                                       keepdims=True))
                r = jnp.concatenate(acc, axis=raxis)
                if raxis == 1:
                    st[0:1, :, 0:1] = jnp.sum(
                        r, axis=1, keepdims=True)[None]
                else:
                    st[0:1, 0:1, :] = jnp.sum(
                        r, axis=0, keepdims=True)[None]
            elif variant.startswith("roll"):
                w = wst[...]
                mask = (x_init[0] > f32(0.5)) if variant == "roll_row" \
                    else (x_init[0] > f32(0.5))
                # 4-stage masked barrel: shifts 1,2,4,8 along the code
                # axis, per-channel select
                ax = 1 if variant == "roll_row" else 0
                if variant == "roll_row":
                    m = st[0] > f32(0.5)           # (C, 1)
                else:
                    m = st[0, 0:1, :] > f32(0.5)   # (1, C)
                for s in (1, 2, 4, 8):
                    rolled = pltpu.roll(w, -s, ax)
                    w = jnp.where(m, rolled, w)
                wst[...] = w
            st[7:8] = v[7:8] * f32(1.0000001)
            return 0

        jax.lax.fori_loop(0, EPOCHS, body, 0)

        @pl.when(g == G - 1)
        def _():
            out_ref[...] = st[...]

    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(sshp, lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(wshp, lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(sshp, lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(sshp, f32),
            scratch_shapes=[pltpu.VMEM(sshp, f32),
                            pltpu.VMEM(wshp, f32)],
        )(x, w)

    x = jnp.ones(sshp, f32) * 0.5
    w = jnp.ones(wshp, f32) * 0.25
    run.__name__ = f"run_{variant}"
    return jax.jit(run), x, w


VARIANTS = ["tr6", "tr2", "wide_row", "wide_col", "red_row", "red_col",
            "roll_row", "roll_col"]

compiled = {}
for v in VARIANTS:
    try:
        fn, x, w = build(v)
        t0 = time.perf_counter()
        c = fn.lower(x, w).compile()
        log(f"{v}: compiled in {time.perf_counter()-t0:.1f}s")
        compiled[v] = (c, x, w)
    except Exception as e:
        log(f"{v}: FAILED to compile: {type(e).__name__}: "
            f"{str(e).splitlines()[0][:200]}")

for v, (c, x, w) in compiled.items():
    jax.block_until_ready(c(x, w))
log("warm-ups synced")

trace_dir = "/tmp/forest_probe3_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
for _ in range(8):
    for v, (c, x, w) in compiled.items():
        c(x, w)
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

for nm, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
    per = tot / cnt / (G * EPOCHS) * 1e9
    log(f"{nm}: {per:.1f} ns/iter")
