"""Correlation primitives: FFT circular correlation and the E/P/L bank.

These are the TPU-native descendants of the firmware's bit-twiddled MAC
loop (``gps_mult_and_summ``, gps_misc.c:48-93) and serial lag scan
(``correlation_search``, gps_misc.c:155-191):

* acquisition evaluates *all* code lags of an epoch at once via
  ``IFFT(FFT(x) . conj(FFT(c)))`` — O(S log S) per (PRN, Doppler) instead
  of the firmware's 2046 serial correlations (~0.2 s/bin on the MCU,
  acquisition.c:279);
* tracking evaluates the three E/P/L lags for all channels as one fused
  multiply-reduce (gps_correlation_iq x3, tracking.c:136-138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CODE_LENGTH, CODE_RATE_HZ, SignalPlan
from ..signal.ca_code import ca_code_bits


def sampled_code_table(prns, plan: SignalPlan, dtype=np.float32) -> np.ndarray:
    """(P, S) bipolar codes sampled at the plan rate with zero code phase."""
    s = plan.samples_per_epoch
    idx = (
        np.floor(np.arange(s) * (CODE_RATE_HZ / plan.sample_rate_hz))
        .astype(np.int64) % CODE_LENGTH
    )
    rows = []
    for prn in prns:
        bits = ca_code_bits(prn)[idx]
        rows.append((1 - 2 * bits.astype(np.int32)).astype(dtype))
    return np.stack(rows)


def code_fft_conj(prns, plan: SignalPlan) -> jnp.ndarray:
    """conj(FFT) of the sampled codes, precomputed once per PRN set."""
    table = sampled_code_table(prns, plan)
    return jnp.conj(jnp.fft.fft(jnp.asarray(table), axis=-1))


def fft_circular_correlate(
    x: jnp.ndarray,             # (..., S) complex epochs
    cfc: jnp.ndarray,           # (P, S) conj code FFTs
) -> jnp.ndarray:
    """Circular correlation of x against every PRN: (..., P, S) complex.

    Lag convention: ``corr[..., p, m] = sum_k x[k] * c[(k - m) % S]`` (c is
    real).  For a signal whose code phase at sample 0 is ``phi`` chips, the
    peak lands at ``m = (S - phi / chips_per_sample) % S``; use
    ``lag_to_code_phase`` to convert.
    """
    X = jnp.fft.fft(x, axis=-1)
    return jnp.fft.ifft(X[..., None, :] * cfc, axis=-1)


def epl_correlate(
    y: jnp.ndarray,             # (C, n) baseband (carrier-wiped) signal
    replicas: jnp.ndarray,      # (C, L, n) sampled bipolar replicas
) -> jnp.ndarray:
    """(C, L) complex correlator outputs: sum_k y[c,k] * r[c,l,k].

    The bipolar replica is real so no conjugation is needed.  With the
    default lags (-0.5, 0, +0.5) chips the columns are (E, P, L), matching
    tracking.c:122-138.

    Implemented as two *real* contractions on y's components: a complex
    x real einsum scalarizes on the XLA CPU backend (~2.6x slower for
    the whole tracking scan); the real form is numerically identical.
    """
    reps = replicas.astype(jnp.float32)
    i_part = jnp.einsum("cn,cln->cl", jnp.real(y).astype(jnp.float32), reps)
    q_part = jnp.einsum("cn,cln->cl", jnp.imag(y).astype(jnp.float32), reps)
    return jax.lax.complex(i_part, q_part)


def lag_to_code_phase(lag_samples, plan: SignalPlan):
    """Convert an FFT-correlation peak lag (samples, possibly fractional)
    to the signal's code phase at sample 0, in chips [0, 1023)."""
    s = plan.samples_per_epoch
    return ((s - np.asarray(lag_samples)) % s) * plan.chips_per_sample


def noncoherent_power(corr: jnp.ndarray) -> jnp.ndarray:
    """|corr|^2 as float32 (acquisition non-coherent accumulation unit)."""
    return (corr.real**2 + corr.imag**2).astype(jnp.float32)
