"""Which op CLASS breaks device->host readback on the axon relay?

Evidence so far: elementwise jit outputs read back fine (conditioner
checksum, digest pytree); every acquisition-shaped program (matmul-DFT
or FFT cube, fused or not) raises UNIMPLEMENTED at the first readback.
This probe reads back a scalar from one tiny jit per op class.

Usage: python tools/tpu_op_readback_probe.py [stage ...]
stages: ew scan matmul matmul-big matmul-bf16 fft fft-axis complex-mm
        iota-big  (default: all, in order, continuing past failures)
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LAST = ["start"]


def log(m):
    _LAST[0] = m
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _alarm(sig, frm):  # noqa: ARG001
    print(f"SELF-ALARM after: {_LAST[0]}", file=sys.stderr, flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)
signal.alarm(int(os.environ.get("PROBE_BUDGET_S", "540")))

# signal.alarm alone cannot fire while the main thread is blocked
# inside a C call (grpc/XLA RPC) — a timer THREAD os._exit()s anyway.
import threading as _th


def _hard_deadline(budget_s: float):
    def _die():
        print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = _th.Timer(budget_s, _die)
    t.daemon = True
    t.start()


_hard_deadline(int(os.environ.get("PROBE_BUDGET_S", "540")) + 30)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

dev = jax.devices()[0]
log(f"device: {dev} ({dev.platform})")

key = jax.random.PRNGKey(0)
x_small = jax.jit(lambda k: jax.random.normal(k, (64, 256)))(key)
xc = jax.jit(lambda k: (jax.random.normal(k, (29, 2046))
                        + 1j * jax.random.normal(k, (29, 2046))))(key)


def stage_ew():
    return jax.jit(lambda a: jnp.sum(a * a))(x_small)


def stage_scan():
    @jax.jit
    def f(a):
        def body(c, row):
            return c + row, None

        out, _ = jax.lax.scan(body, jnp.zeros((256,)), a)
        return jnp.sum(out)

    return f(x_small)


def stage_matmul():
    return jax.jit(lambda a: jnp.sum(a @ a.T))(x_small)


def stage_matmul_big():
    @jax.jit
    def f(k):
        m = jax.random.normal(k, (2046, 2046), jnp.float32)
        return jnp.sum(m @ m)

    return f(key)


def stage_matmul_bf16():
    @jax.jit
    def f(k):
        m = jax.random.normal(k, (2046, 2046), jnp.float32)
        return jnp.sum(jax.lax.dot_general(
            m, m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32))

    return f(key)


def stage_fft():
    return jax.jit(lambda a: jnp.sum(jnp.abs(jnp.fft.fft(a[0]))))(xc)


def stage_fft_axis():
    return jax.jit(lambda a: jnp.sum(jnp.abs(jnp.fft.fft(a, axis=-1))))(xc)


def stage_complex_mm():
    @jax.jit
    def f(a):
        m = a[:, :29]                       # (29, 29) complex
        return jnp.sum(jnp.abs(m @ m))

    return f(xc)


def stage_iota_big():
    @jax.jit
    def f():
        i = jnp.arange(2046, dtype=jnp.float32)
        tbl = jnp.cos(i[:, None] * i[None, :] * (2 * np.pi / 2046))
        return jnp.sum(tbl)

    return f()


STAGES = {
    "ew": stage_ew, "scan": stage_scan, "matmul": stage_matmul,
    "matmul-big": stage_matmul_big, "matmul-bf16": stage_matmul_bf16,
    "fft": stage_fft, "fft-axis": stage_fft_axis,
    "complex-mm": stage_complex_mm, "iota-big": stage_iota_big,
}

names = sys.argv[1:] or list(STAGES)
for nm in names:
    try:
        t0 = time.perf_counter()
        v = float(np.asarray(STAGES[nm]()))
        log(f"{nm}: OK ({v:.2f}) in {time.perf_counter()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        log(f"{nm}: FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:90]}")
