"""Run bench.py's EXACT acquisition program (cached compile) and READ
BACK its reduced outputs — isolates fresh-compile-vs-execution as the
failure mode behind the acquisition readback UNIMPLEMENTEDs.
"""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _alarm(sig, frm):  # noqa: ARG001
    print("SELF-ALARM", file=sys.stderr, flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)
signal.alarm(int(os.environ.get("PROBE_BUDGET_S", "540")))

# signal.alarm alone cannot fire while the main thread is blocked
# inside a C call (grpc/XLA RPC) — a timer THREAD os._exit()s anyway.
import threading as _th


def _hard_deadline(budget_s: float):
    def _die():
        print("HARD-DEADLINE", file=sys.stderr, flush=True)
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

from stm32f4_sdr_gps_tpu.acquire.engine import (  # noqa: E402
    acquisition_power,
    analyze_power_device,
    exclusion_lags,
)
from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.correlate import (  # noqa: E402
    code_spectrum_conj_matmul,
    dft_tables_device,
    pack_code_bits,
    unpack_code_table,
)
from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations  # noqa: E402

dev = jax.devices()[0]
log(f"device: {dev}")
plan = BASEBAND_PLAN
acq = AcqConfig()
s = plan.samples_per_epoch
n_prns = int(os.environ.get("PROBE_PRNS", "32"))
prns = list(range(1, n_prns + 1))
packed = pack_code_bits(prns, plan)
bins_host = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
table_d = unpack_code_table(jax.device_put(packed), s)
rot_d = jax.jit(doppler_rotations, static_argnums=(1, 2))(
    jax.device_put(bins_host), s, plan.sample_rate_hz)


@jax.jit
def _make(key):
    kr, ki = jax.random.split(key)
    shape = (acq.noncoherent_epochs, plan.samples_per_epoch)
    return (jax.random.normal(kr, shape, dtype=jnp.float32)
            + 1j * jax.random.normal(ki, shape, dtype=jnp.float32))


acq_epochs = _make(jax.random.PRNGKey(1))
bins_d = jax.device_put(bins_host)
excl = exclusion_lags(acq, plan)
dft_d = dft_tables_device(s)
cfc_d = code_spectrum_conj_matmul(table_d, *dft_d)
power_fn = jax.jit(lambda e, c, r, b, w0, w1: analyze_power_device(
    acquisition_power(e, c, r, coherent=1, dft=(w0, w1),
                      dft_precision=jax.lax.Precision.DEFAULT), b, excl))
args = (acq_epochs, cfc_d, rot_d, bins_d) + dft_d
t0 = time.perf_counter()
power_fn = power_fn.lower(*args).compile()
log(f"compiled in {time.perf_counter()-t0:.1f}s (cached => ~0.3s)")
p = power_fn(*args)
log("dispatched")
try:
    vals = [np.asarray(v) for v in p]
    log(f"READBACK OK: peak[0]={vals[0][0]:.1f} dop[0]={vals[2][0]:.0f}")
except Exception as e:  # noqa: BLE001
    log(f"READBACK FAILED: {type(e).__name__}: "
        f"{str(e).splitlines()[0][:90]}")
