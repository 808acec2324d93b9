"""Bisect which piece of the tracking path hits UNIMPLEMENTED on the
axon TPU transport.  Run from the repo root:  python tools/tpu_bisect.py

Primitives (complex mul/matmul/scan/fft/gather) are known-good; the
full track_block fails.  Stage through its internals.  Every stage has
an internal SIGALRM budget and the process always exits on its own
(killing a client mid-claim wedges the tunnel, CLAUDE.md).
"""
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "init"


def _alarm(sig, frm):
    print(f"ALARM in stage: {STAGE}", flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)


def try_stage(name, fn, secs=180):
    global STAGE
    STAGE = name
    signal.alarm(secs)
    print(f"--- {name}", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"    OK ({time.time()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"    FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
        return False


STAGE = "import"
signal.alarm(120)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

print("device:", jax.devices()[0], flush=True)

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.correlate import epl_correlate  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.replica import sample_replicas  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.wipeoff import carrier_wipeoff  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.track.scan import track_epoch_step  # noqa: E402
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402

plan = BASEBAND_PLAN
cfg = TrackConfig()
S = plan.samples_per_epoch
rng = np.random.default_rng(0)
x1 = jnp.asarray((rng.standard_normal(S) + 1j * rng.standard_normal(S))
                 .astype(np.complex64))
tbl = jnp.asarray(ca_table_bipolar([1, 2]).astype(np.float32))
st = init_state(2, np.array([10.0, 20.0]), np.array([100.0, -100.0]))

try_stage("transfer-state-pytree", lambda: jax.block_until_ready(
    jax.tree_util.tree_map(lambda a: jnp.asarray(a) if hasattr(a, "shape")
                           else a, st)))

cfreq = jnp.full(2, plan.chips_per_sample, jnp.float32)

try_stage("carrier_wipeoff", lambda: jax.block_until_ready(
    jax.jit(lambda d, p: carrier_wipeoff(x1, d, p, plan.sample_rate_hz))(
        st.doppler_hz, st.carrier_phase_cycles)), 300)

try_stage("sample_replicas", lambda: jax.block_until_ready(
    jax.jit(lambda cp: sample_replicas(
        tbl, cp, cfreq, S, (-0.5, 0.0, 0.5)))(st.code_phase_chips)))


def _epl():
    reps = sample_replicas(tbl, st.code_phase_chips, cfreq, S,
                           (-0.5, 0.0, 0.5))
    y, _ = carrier_wipeoff(x1, st.doppler_hz, st.carrier_phase_cycles,
                           plan.sample_rate_hz)
    return epl_correlate(y, reps)


try_stage("epl_correlate", lambda: jax.block_until_ready(jax.jit(_epl)()))

try_stage("arctan2+sign-int8", lambda: jax.block_until_ready(
    jax.jit(lambda a, b: (jnp.arctan2(a * jnp.sign(b), jnp.abs(b)),
                          jnp.where(a > 0, 1, -1).astype(jnp.int8)))(
        jnp.ones(4), jnp.ones(4))))

try_stage("single-epoch-step", lambda: jax.block_until_ready(
    jax.jit(lambda s, x: track_epoch_step(s, x, tbl, plan, cfg))(st, x1)))


def _scan16():
    xs = jnp.tile(x1[None], (16, 1))

    def body(s, x):
        return track_epoch_step(s, x, tbl, plan, cfg)

    return jax.lax.scan(body, st, xs)


try_stage("scan-16-epochs", lambda: jax.block_until_ready(
    jax.jit(_scan16)()), 240)

tbl32 = jnp.asarray(ca_table_bipolar(list(range(1, 33))).astype(np.float32))
st32 = init_state(32, np.full(32, 10.0), np.zeros(32))

try_stage("scan-16-epochs-32ch", lambda: jax.block_until_ready(
    jax.jit(lambda s, xs: jax.lax.scan(
        lambda c, x: track_epoch_step(c, x, tbl32, plan, cfg), s, xs))(
        st32, jnp.tile(x1[None], (16, 1)))), 300)

STAGE = "done"
signal.alarm(30)
print("BISECT COMPLETE", flush=True)
os._exit(0)
