"""Microbenchmark: would an MXU block-diagonal correlation beat the
kernel's six VPU mult+reduce correlators (3.03 us/epoch at 32 ch)?

Two minimal Pallas kernels with the SAME I/O shape, T sequential grid
steps each (mirroring the tracking kernel's structure):

  vpu:  six jnp.sum((C,SP)*(C,SP)) mult+reduces per step (the current
        correlator section)
  mxu:  two (C,SP)@(SP,128) dots per step (yr and yi against a
        block-diagonal replica matrix; bf16 inputs, f32 accumulate)
        + the (C,128) one-hot extraction reduces

Usage: python tools/mxu_corr_probe.py [variant] [T]   (variant: vpu|mxu)
One variant per process (fresh compile each).
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
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

C, SP, N = 32, 2048, 128
variant = sys.argv[1] if len(sys.argv) > 1 else "vpu"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1600


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def make_fn():
    def kernel(yr_ref, yi_ref, rep_ref, repT_ref, mask_ref, out_ref, acc):
        t = pl.program_id(0)
        # tiny per-step perturbation so steps can't be CSE'd
        yr = yr_ref[...] + t.astype(jnp.float32) * 1e-9
        yi = yi_ref[...]
        if variant == "vpu":
            r0 = rep_ref[0]
            r1 = rep_ref[1]
            r2 = rep_ref[2]
            s0 = jnp.sum(yr * r0, axis=1, keepdims=True)
            s1 = jnp.sum(yi * r0, axis=1, keepdims=True)
            s2 = jnp.sum(yr * r1, axis=1, keepdims=True)
            s3 = jnp.sum(yi * r1, axis=1, keepdims=True)
            s4 = jnp.sum(yr * r2, axis=1, keepdims=True)
            s5 = jnp.sum(yi * r2, axis=1, keepdims=True)
            tot = s0 + s1 + s2 + s3 + s4 + s5
        else:
            rT = repT_ref[...]                     # (SP, N) bf16
            m1 = jax.lax.dot_general(
                yr.astype(jnp.bfloat16), rT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (C, N)
            m2 = jax.lax.dot_general(
                yi.astype(jnp.bfloat16), rT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mask = mask_ref[...]                   # (C, N) one-hot x3
            tot = (jnp.sum(m1 * mask, axis=1, keepdims=True)
                   + jnp.sum(m2 * mask, axis=1, keepdims=True))
        acc[...] = acc[...] + tot

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((C, SP), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, SP), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, SP), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SP, N), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, 1), jnp.float32)],
    )


rng = np.random.default_rng(0)
yr = jnp.asarray(rng.standard_normal((C, SP)).astype(np.float32))
yi = jnp.asarray(rng.standard_normal((C, SP)).astype(np.float32))
rep = jnp.asarray(np.sign(rng.standard_normal((3, C, SP))).astype(np.float32))
repT = jnp.asarray(np.sign(
    rng.standard_normal((SP, N))).astype(np.float32)).astype(jnp.bfloat16)
mask = np.zeros((C, N), np.float32)
for c in range(C):
    mask[c, 3 * c] = 1.0
mask = jnp.asarray(mask)

fn = jax.jit(lambda a, b, r, rt, m: make_fn()(a, b, r, rt, m))
t0 = time.perf_counter()
fn = fn.lower(yr, yi, rep, repT, mask).compile()
log(f"{variant}: compiled in {time.perf_counter()-t0:.1f}s")
o = fn(yr, yi, rep, repT, mask)
jax.block_until_ready(o)
log("warm-up synced")

trace_dir = "/tmp/mxu_corr_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
for _ in range(4):
    o = fn(yr, yi, rep, repT, mask)
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
log(f"{variant}: {cnt} execs x {T} steps, {tot*1e3:.2f} ms device "
    f"=> {tot/cnt/T*1e9:.0f} ns/step")
