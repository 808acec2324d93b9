"""Probe the axon tunnel's device->host path at DIGEST scale.

CLAUDE.md records (round 1) that device->host transfers raise
UNIMPLEMENTED.  The round-4 verdict's top item — run the whole receiver
ON the TPU with digest-only readbacks — needs small (~kB) readbacks to
work.  This probe establishes, one op per stderr line:

  1. tiny readback    — np.asarray of a (32,) f32 jit output
  2. digest readback  — np.asarray over a ~kB pytree of jit outputs
  3. wire upload      — host->device of a 256 KB uint16 1-bit capture
                        chunk (the reference wire format is 2 046 B/ms,
                        signal_capture.c:9-11 — 100 ms ~= 200 KB)
  4. on-device conditioner — unpack+mix+decimate the uploaded words to
                        complex baseband entirely in one jit, then read
                        back only a scalar checksum

Usage: python tools/tpu_readback_probe.py   (self-alarmed, never kill)
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
signal.alarm(int(os.environ.get("PROBE_BUDGET_S", "420")))

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


_hard_deadline(int(os.environ.get("PROBE_BUDGET_S", "420")) + 30)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

dev = jax.devices()[0]
log(f"device: {dev} ({dev.platform})")

# 1. tiny readback
x = jax.jit(lambda k: jax.random.normal(k, (32,), jnp.float32))(
    jax.random.PRNGKey(0))
log("tiny jit dispatched")
try:
    h = np.asarray(x)
    log(f"tiny readback OK: shape {h.shape}, mean {h.mean():.4f}")
except Exception as e:  # noqa: BLE001
    log(f"tiny readback FAILED: {type(e).__name__}: {e}")

# 2. digest-scale pytree readback (~kB of mixed dtypes, like BlockDigest)
@jax.jit
def _digest_like(k):
    ka, kb = jax.random.split(k)
    return {
        "f32_mat": jax.random.normal(ka, (8, 32), jnp.float32),
        "i32_vec": jnp.arange(32, dtype=jnp.int32),
        "bool_vec": jax.random.normal(kb, (32,)) > 0,
        "f32_vec": jnp.ones((32,), jnp.float32) * 3.25,
    }


d = _digest_like(jax.random.PRNGKey(1))
log("digest-like jit dispatched")
try:
    dh = jax.tree.map(np.asarray, d)
    log(f"digest readback OK: f32_vec[0]={dh['f32_vec'][0]}, "
        f"i32 sum={dh['i32_vec'].sum()}, bools={dh['bool_vec'].sum()}")
except Exception as e:  # noqa: BLE001
    log(f"digest readback FAILED: {type(e).__name__}: {e}")

# 3. wire-format upload: 128 ms of 1-bit capture = 128*2046 B = 261 888 B
words = np.arange(128 * 1023, dtype=np.uint16)  # 256 KB
try:
    wd = jax.device_put(words)
    jax.block_until_ready(wd)
    log(f"wire upload OK: {words.nbytes} bytes uint16")
except Exception as e:  # noqa: BLE001
    log(f"wire upload FAILED: {type(e).__name__}: {e}")
    os._exit(1)

# 4. on-device conditioner: unpack LSB16 -> +/-1 @16.368MHz -> mix Fs/4
#    -> boxcar-8 decimate -> complex64 @2.046MHz, scalar checksum out
DEC = 8


@jax.jit
def conditioner_checksum(w):
    bits = (w[:, None] >> jnp.arange(16, dtype=jnp.uint16)) & 1
    signs = bits.astype(jnp.float32).reshape(-1) * 2.0 - 1.0
    n = signs.shape[0]
    # IF = Fs/4: mix sequence period 4 = [1, -j, -1, j]
    mix = jnp.array([1, -1j, -1, 1j], jnp.complex64)
    y = signs.astype(jnp.complex64) * jnp.tile(mix, n // 4)
    bb = y.reshape(-1, DEC).sum(axis=1) * (2.0 / DEC)
    return jnp.sum(jnp.abs(bb) ** 2), bb.shape[0]


try:
    s, nbb = conditioner_checksum(wd)
    sh = float(np.asarray(s))
    log(f"on-device conditioner OK: {int(nbb)} baseband samples, "
        f"power checksum {sh:.1f}")
except Exception as e:  # noqa: BLE001
    log(f"on-device conditioner FAILED: {type(e).__name__}: {e}")

# 5. repeated small readbacks (the receiver does one per 100 ms block)
try:
    t0 = time.perf_counter()
    n_ok = 0
    for i in range(20):
        y = jax.jit(lambda a, i=i: a * (i + 1))(x)
        _ = np.asarray(y)
        n_ok += 1
    dt = (time.perf_counter() - t0) / max(n_ok, 1)
    log(f"repeated readbacks OK: {n_ok}/20, {dt*1e3:.1f} ms each")
except Exception as e:  # noqa: BLE001
    log(f"repeated readbacks FAILED at {n_ok}: {type(e).__name__}: {e}")

log("probe done")
