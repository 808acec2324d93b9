"""Characterize the cost of tiny chained VPU ops inside a Pallas TPU
kernel — the mechanism behind the tracking kernel's "scalar forest"
(89% of device time, docs/ROADMAP.md §3).

Each variant runs a grid of sequential steps; every step executes EPOCHS
inner iterations of a K-op dependent chain on a given operand shape.
Comparing variants answers, with one TPU round trip:

* layout:   (C, 1) sublane-major vs (1, C) lane-major vs (8, C) packed
            — does vreg count per op matter, or is cost per-op?
* ILP:      one K-chain vs 4 independent K/4-chains — does Mosaic/VPU
            overlap independent tiny ops?
* op type:  fma vs compare+select vs int ops.

Usage: python tools/forest_probe.py [C] [K] [G]
Self-alarmed (tunnel rules in CLAUDE.md — never kill externally).
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
G = int(sys.argv[3]) if len(sys.argv) > 3 else 128
EPOCHS = 8
f32 = jnp.float32


def build(variant):
    if variant.startswith("c1"):
        shp = (2, C, 1)
    elif variant.startswith("lc"):
        shp = (2, 1, C)
    elif variant.startswith("fc"):
        shp = (2, 8, C)
    elif variant.startswith("kc"):
        shp = (2, 16, C, 1)      # leading-axis field pack: 16 (C,1) rows
    elif variant.startswith("k4"):
        shp = (2, 4, C, 1)       # leading-axis field pack: 4 (C,1) rows
    elif variant.startswith("ilp"):
        shp = (8, C, 1)          # 4 independent (a, b) chains
    else:
        shp = (2, C, 1)

    def chain_fma(a, b, n):
        for _ in range(n):
            a = a * f32(1.000001) + b
            b = b * f32(0.999999) + a
        return a, b

    def chain_sel(a, b, n):
        for _ in range(n):
            m = a > b
            a = jnp.where(m, a * f32(0.5) + b, b - a)
            b = jnp.where(m, b, b * f32(0.5) + a)
        return a, b

    def chain_int(a, b, n):
        ai = a.astype(jnp.int32)
        bi = b.astype(jnp.int32)
        for _ in range(n):
            ai = jnp.minimum(ai + 1, 1000) ^ bi
            bi = jnp.maximum(bi - 1, -1000) + ai
        return ai.astype(f32), bi.astype(f32)

    def kernel(x_init, out_ref, st):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            st[...] = x_init[...]

        def body(ei, _):
            v = st[...]
            if variant.startswith("ilp"):
                # 4 independent chains of K//4 dependent pairs each
                outs = []
                for j in range(4):
                    a, b = chain_fma(v[2 * j], v[2 * j + 1], K // 4)
                    outs += [a, b]
                st[...] = jnp.stack(outs)
            else:
                fn = {"fma": chain_fma, "sel": chain_sel,
                      "int": chain_int}[variant.split("_")[1]]
                a, b = fn(v[0], v[1], K)
                st[...] = jnp.stack([a, b])
            return 0

        jax.lax.fori_loop(0, EPOCHS, body, 0)

        @pl.when(g == G - 1)
        def _():
            out_ref[...] = st[...]

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(shp, lambda t: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shp, lambda t: (0,) * len(shp),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shp, f32),
            scratch_shapes=[pltpu.VMEM(shp, f32)],
        )(x)

    x = jnp.ones(shp, f32) * 0.5
    run.__name__ = f"run_{variant}"   # distinct jit_ names in the trace
    fn = jax.jit(run)
    return fn, x


VARIANTS = ["c1_fma", "lc_fma", "fc_fma", "ilp_fma",
            "c1_sel", "lc_sel", "c1_int", "lc_int",
            "kc_fma", "k4_fma", "kc_sel"]

compiled = {}
for v in VARIANTS:
    fn, x = build(v)
    t0 = time.perf_counter()
    c = fn.lower(x).compile()
    log(f"{v}: compiled in {time.perf_counter()-t0:.1f}s")
    compiled[v] = (c, x)

# warm up all
for v, (c, x) in compiled.items():
    jax.block_until_ready(c(x))
log("warm-ups synced")

trace_dir = "/tmp/forest_probe_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
for _ in range(8):
    for v, (c, x) in compiled.items():
        c(x)
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

# jit names are all jit_run — distinguish by fingerprint suffix count;
# fall back: order of total time won't identify variants, so re-trace
# per variant would be needed.  Instead, name the jitted fns uniquely.
for nm, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
    per_epoch = tot / cnt / (G * EPOCHS)
    log(f"{nm}: {cnt} execs, {tot*1e3:.2f} ms total, "
        f"{per_epoch*1e9:.1f} ns/iter, {per_epoch*1e9/K:.2f} ns/op-pair")
