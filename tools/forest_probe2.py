"""Probe the REAL suspects for the tracking kernel's per-epoch cost.

forest_probe.py showed plain chained tiny ops cost ~1.4-2.8 ns each —
the 4.9 us/epoch "forest" must come from structural constructs instead.
Each variant here isolates one construct, run EPOCHS times per grid
step (matching the kernel's fori_loop(EPB) shape):

  base      minimal epoch body (load planes, 2 fma pairs, store planes)
  when_any  + @pl.when(jnp.any(vector cmp)) guarded no-op   [scalar sync]
  concat16  + out = concat of 16 (C,1) pieces along lanes   [relayout]
  stack13   + stacked store of 13 (C,1) planes
  imod4     + 4 integer mod ops (int div has no HW unit)
  fdiv4     + 4 f32 divides
  dynstore  + out_ref[ei] dynamic-index store of (C,16)
  sincos    + cos+sin on (C,1)
  costas    + the 9th-order polynomial discriminator (with divide)
  lcg       + the integer LCG + compares

Usage: python tools/forest_probe2.py [C]
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
G = 128
EPOCHS = 8
f32 = jnp.float32
NP = 13          # planes, mirroring NF32


def build(variant):
    shp = (NP, C, 1)
    out_shp = (G, C, 16)

    def kernel(x_init, out_ref, st, st_i):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            st[...] = x_init[...]
            st_i[...] = x_init[...].astype(jnp.int32)

        def body(ei, _):
            v = st[...]
            a, b = v[0], v[1]
            iv = st_i[...]
            ia, ib = iv[0], iv[1]
            for _ in range(2):
                a = a * f32(1.000001) + b
                b = b * f32(0.999999) + a

            extra_f = []
            extra_i = []
            if variant == "when_any":
                @pl.when(jnp.any(a > b * f32(1e9)))
                def _():
                    st[0] = a + f32(1.0)
            elif variant == "when_any4":
                for j in range(4):
                    @pl.when(jnp.any(a > b * f32(1e9) + f32(j)))
                    def _():
                        st[0] = a + f32(1.0)
            elif variant == "concat16":
                pieces = [a * f32(1.0 + 0.01 * j) for j in range(16)]
                out_ref[0] = jnp.concatenate(pieces, axis=1)
            elif variant == "stack13":
                st[...] = jnp.stack(
                    [a * f32(1.0 + 0.001 * j) for j in range(NP)])
            elif variant == "imod4":
                for j in range(4):
                    ia = jnp.mod(ib - ia, 20 + j)
                extra_i.append(ia)
            elif variant == "fdiv4":
                for j in range(4):
                    a = b / jnp.maximum(a, f32(1e-12))
                    b = a + b
            elif variant == "dynstore":
                out_ref[pl.ds(g, 1)] = jnp.broadcast_to(
                    a, (C, 16))[None]
            elif variant == "sincos":
                a = jnp.cos(a) + jnp.sin(b)
            elif variant == "costas":
                y = b * jnp.sign(a)
                ax = jnp.abs(a)
                ay = jnp.abs(y)
                z = jnp.minimum(ax, ay) / jnp.maximum(
                    jnp.maximum(ax, ay), f32(1e-30))
                z2 = z * z
                p = f32(0.0208351)
                p = p * z2 - f32(0.0851330)
                p = p * z2 + f32(0.1801410)
                p = p * z2 - f32(0.3302995)
                p = p * z2 + f32(0.9998660)
                w = z * p
                w = jnp.where(ay > ax, f32(np.pi / 2) - w, w)
                a = jnp.sign(y) * w / f32(np.pi)
            elif variant == "lcg":
                s = ia * jnp.int32(1664525) + jnp.int32(1013904223)
                s = s ^ jax.lax.shift_right_logical(s, 16)
                s = s * jnp.int32(np.int64(2246822519) - (1 << 32))
                u = jax.lax.shift_right_logical(s, 8).astype(f32) / f32(1 << 24)
                a = jnp.where(u > f32(0.5), a, b)

            st[0:2] = jnp.stack([a, b])
            if extra_i:
                st_i[0:1] = extra_i[0][None]
            return 0

        jax.lax.fori_loop(0, EPOCHS, body, 0)

        @pl.when(g == G - 1)
        def _():
            out_ref[pl.ds(0, 1)] = jnp.broadcast_to(st[0], (C, 16))[None]

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(shp, lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shp, lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shp, f32),
            scratch_shapes=[pltpu.VMEM(shp, f32),
                            pltpu.VMEM(shp, jnp.int32)],
        )(x)

    x = jnp.ones(shp, f32) * 0.5
    run.__name__ = f"run_{variant}"
    return jax.jit(run), x


VARIANTS = ["base", "when_any", "when_any4", "concat16", "stack13",
            "imod4", "fdiv4", "dynstore", "sincos", "costas", "lcg"]

compiled = {}
for v in VARIANTS:
    fn, x = build(v)
    t0 = time.perf_counter()
    c = fn.lower(x).compile()
    log(f"{v}: compiled in {time.perf_counter()-t0:.1f}s")
    compiled[v] = (c, x)

for v, (c, x) in compiled.items():
    jax.block_until_ready(c(x))
log("warm-ups synced")

trace_dir = "/tmp/forest_probe2_trace"
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

res = {}
for nm, (cnt, tot) in agg.items():
    res[nm] = tot / cnt / (G * EPOCHS) * 1e9
base = res.get("jit_run_base(", None)
basev = min((v for k, v in res.items() if "run_base" in k), default=0.0)
for nm, ns in sorted(res.items(), key=lambda kv: kv[1][1] if False else -kv[1]):
    log(f"{nm}: {ns:.1f} ns/iter (delta vs base {ns-basev:+.1f})")
