"""Pallas TPU kernel: fused carrier wipe-off + E/P/L correlator bank.

The hot per-epoch tracking compute (descendant of the firmware's
``gps_shift_to_zero_freq_track`` + ``gps_correlation_iq`` x3 bit loops,
gps_misc.c:128-145, 244-274) fused into ONE kernel per channel:

    carrier NCO (sin/cos rotation) -> 3 replica lags -> 6 reductions

Key structural trick: at exactly 2 samples/chip the sampled replica
``code[floor(phase + k/2)]`` depends only on the *integer half-chip*
part of the code phase — for any sub-half-chip fraction mu in [0,1),
``floor((M + mu + k)/2) == floor((M + k)/2)``.  So the code NCO inside
the kernel is a dynamic slice at offset M into a doubled 2-sample/chip
upsampled code (no per-sample gather), with E/P/L at offsets M-1, M,
M+1.  The fractional phase still advances in the (outside) state update,
so long-term code tracking stays exact.

The jnp reference path (ops.replica + ops.correlate.epl_correlate) is
the correctness oracle; tests run this kernel in interpreter mode on
CPU and natively on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CODE_LENGTH

S = 2 * CODE_LENGTH            # 2046 samples / epoch at 2 chips/sample
SP = 2048                      # lane-padded epoch length
U2P = 4352                     # lane-padded doubled upsampled code (+ margin)


def upsampled_code_doubled(code_table: np.ndarray) -> np.ndarray:
    """(C, U2P) float32: code upsampled to 2 samples/chip, tiled to the
    full lane-aligned kernel width.

    Row layout: U[j] = code[floor(j/2) mod 1023] for ALL j < U2P, so
    U[j] == U[j + S] everywhere — the in-kernel-scan barrel relies on
    that periodicity to fold code wraps (mc jumping 2046 -> 1) back
    into its shift range with an exact replica.  (The epl kernel only
    reads j <= 4095; lanes beyond 2*S there multiply the zero-padded
    signal tail, so extending the fill changes nothing for it.)
    """
    c = code_table.shape[0]
    j = np.arange(U2P)
    idx = (j // 2) % CODE_LENGTH
    out = np.empty((c, U2P), dtype=np.float32)
    out[:, :] = code_table[:, idx]
    return out


def _epl_kernel_real(m_ref, xr_ref, xi_ref, u2_ref, dop_ref, ph_ref,
                     out_ref):
    """One grid program per channel; all refs carry the full arrays
    (TPU block shapes must tile to (8,128) or equal the array dims), the
    channel row is selected with program_id."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    # iota must be integer-typed on TPU; cast after
    k = jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1).astype(jnp.float32)
    ang = ph_ref[i, 0] + dop_ref[i, 0] * k
    ang = ang - jnp.floor(ang)
    two_pi = jnp.float32(2.0 * np.pi)
    c = jnp.cos(two_pi * ang)
    s = jnp.sin(two_pi * ang)
    xr = xr_ref[0:1, :]
    xi = xi_ref[0:1, :]
    yr = xr * c + xi * s
    yi = xi * c - xr * s

    # Unaligned dynamic lane slices are not lowerable on TPU; rotate the
    # whole doubled-code row left by (m-1) with tpu dynamic_rotate, then
    # the three lags are static windows [0:SP], [1:SP+1], [2:SP+2] — but
    # static unaligned starts are also disallowed, so rotate once per lag.
    from jax.experimental.pallas import tpu as pltpu

    m = m_ref[i, 0]
    row = u2_ref[i, :].reshape(1, U2P)
    sums = []
    for lag in (-1, 0, 1):
        # left-roll by (m + lag) spelled with a NON-NEGATIVE dynamic
        # amount: negative tpu.dynamic_rotate amounts produce garbage
        # on real hardware at non-power-of-two widths (exact only in
        # interpret mode / at power-of-two widths, which is why the
        # (8, 256) bisect probe passed); tools/tpu_roll_wide_probe.py
        sft = m + lag                      # in [0, S + 1]
        amt = jnp.where(sft > 0, U2P - sft, 0)
        rep = pltpu.roll(row, amt, 1)[:, :SP]
        sums.append(jnp.sum(yr * rep, keepdims=True).reshape(1, 1))
        sums.append(jnp.sum(yi * rep, keepdims=True).reshape(1, 1))
    sums.append(jnp.zeros((1, 2), jnp.float32))
    # scalar stores to VMEM are illegal on TPU; write the row as one
    # (1, 8) vector store
    out_ref[pl.ds(i, 1), :] = jnp.concatenate(sums, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def epl_correlate_pallas(
    x: jnp.ndarray,            # (S,) complex64 epoch
    u2: jnp.ndarray,           # (C, U2P) doubled upsampled codes
    code_phase_chips: jnp.ndarray,   # (C,) f32
    doppler_hz: jnp.ndarray,   # (C,) f32
    carrier_phase_cycles: jnp.ndarray,  # (C,) f32
    sample_rate_hz: float = 2.046e6,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, 3) complex64 E/P/L correlations — fused Pallas path.

    Matches ops.correlate.epl_correlate(ops.wipeoff + ops.replica) up to
    the sub-half-chip replica equivalence described in the module
    docstring (exact at integer-sample code phases).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c_cnt = u2.shape[0]
    xr = jnp.zeros((1, SP), jnp.float32).at[0, :S].set(x.real)
    xi = jnp.zeros((1, SP), jnp.float32).at[0, :S].set(x.imag)

    # integer half-chip shift: replica_k = U[(M + k) mod 2S]; slice start
    # must be >= 0 for the early lag, so fold into [1, 2S+1)
    m = jnp.floor(2.0 * code_phase_chips).astype(jnp.int32) % S
    m = jnp.where(m == 0, S, m)      # keep the early-lag slice start >= 0
    m2 = m.reshape(c_cnt, 1)
    dop = (doppler_hz / jnp.float32(sample_rate_hz)).astype(
        jnp.float32).reshape(c_cnt, 1)
    ph = carrier_phase_cycles.astype(jnp.float32).reshape(c_cnt, 1)

    # Full-array blocks (grid programs pick their row via program_id):
    # TPU requires block shapes tiled to (8,128) or equal to the array.
    out = pl.pallas_call(
        _epl_kernel_real,
        grid=(c_cnt,),
        in_specs=[
            pl.BlockSpec((c_cnt, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_cnt, U2P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_cnt, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c_cnt, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((c_cnt, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_cnt, 8), jnp.float32),
        interpret=interpret,
    )(m2, xr, xi, u2, dop, ph)

    epl = out[:, :6].reshape(c_cnt, 3, 2)
    return (epl[..., 0] + 1j * epl[..., 1]).astype(jnp.complex64)
