"""GPS L1 C/A signal simulator.

Supersedes the reference's single-satellite square-wave fixture
(``/root/reference/Firmware/project_single_sat/GPS/simulator.c:88-146``,
noise knob ``:40-58``) with a proper multi-satellite IQ synthesizer:

* carrier at arbitrary Doppler with continuous phase,
* code NCO with carrier-coherent code Doppler,
* 50 bps nav-bit modulation (real LNAV subframes via
  :mod:`stm32f4_sdr_gps_tpu.signal.nav_message`),
* calibrated C/N0 with complex AWGN,
* complex-baseband output (TPU plan) or 1-bit real IF output matching the
  reference front-end format (config.h:23-26).

Ground truth (code phase / Doppler / bit stream per satellite) is returned
alongside the samples so tests can assert acquisition/tracking/decode
parity (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from ..config import (
    CODE_LENGTH,
    CODE_RATE_HZ,
    CODES_IN_BIT,
    FREQ_L1_HZ,
    SignalPlan,
    BASEBAND_PLAN,
)
from .ca_code import ca_code_bits


@dataclass
class SimSat:
    """One simulated satellite signal."""

    prn: int
    doppler_hz: float = 0.0
    code_phase_chips: float = 0.0      # code phase at sample 0
    carrier_phase_cycles: float = 0.0
    cn0_dbhz: float = 45.0
    nav_bits: Optional[np.ndarray] = None   # 0/1 bits at 50 bps; None => all 0
    nav_epoch_offset: int = 0          # code periods until first bit boundary shift
    code_doppler: bool = True          # scale code rate by (1 + fd/fL1)
    codes_in_bit: int = CODES_IN_BIT   # compressed-time tests may lower this
    # Exact signal delay: when set, overrides code_phase_chips /
    # nav_epoch_offset so that bit k of nav_bits starts arriving at
    # t = delay_ms + k*codes_in_bit ms — a physically consistent TOF for
    # pseudorange tests.  Bits "before" t=0 wrap to the stream end.
    delay_ms: Optional[float] = None
    # Satellite dynamics: Doppler ramp (Hz/s).  The carrier phase uses
    # the chirp integral and the code rate follows coherently, like a
    # real accelerating line-of-sight (GPS satellites: up to ~0.9 Hz/s).
    doppler_rate_hz_s: float = 0.0


@dataclass
class SimTruth:
    """Per-satellite ground truth of a simulated capture."""

    sats: Sequence[SimSat]
    plan: SignalPlan
    noise_sigma: float
    amplitudes: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def code_phase_at_epoch(self, sat_idx: int, epoch: int) -> float:
        """True code phase (chips, mod 1023) at the start of ``epoch``."""
        sat = self.sats[sat_idx]
        t = epoch * self.plan.samples_per_epoch / self.plan.sample_rate_hz
        dop_int = sat.doppler_hz * t + 0.5 * sat.doppler_rate_hz_s * t**2
        code_time = t + (dop_int / FREQ_L1_HZ if sat.code_doppler else 0.0)
        if sat.delay_ms is not None:
            chips = CODE_RATE_HZ * (code_time - sat.delay_ms * 1e-3)
        else:
            chips = sat.code_phase_chips + CODE_RATE_HZ * code_time
        return float(chips % CODE_LENGTH)


def inject_fault(
    samples: np.ndarray,
    start_ms: float,
    duration_ms: float,
    mode: str = "dropout",
    sample_rate_hz: float = 2.046e6,
    seed: int = 0,
) -> np.ndarray:
    """Fault injection (the role of the firmware fixture's noise knob,
    simulator.c:40-58, but time-targeted): corrupt a span of a capture.

    ``mode``: 'dropout' zeroes the span (signal blockage); 'noise'
    replaces it with unit AWGN (jamming/interference burst).
    """
    out = samples.copy()
    a = int(start_ms * 1e-3 * sample_rate_hz)
    b = a + int(duration_ms * 1e-3 * sample_rate_hz)
    b = min(b, len(out))
    if mode == "dropout":
        out[a:b] = 0
    elif mode == "noise":
        rng = np.random.default_rng(seed)
        n = b - a
        if np.iscomplexobj(out):
            out[a:b] = (rng.standard_normal(n)
                        + 1j * rng.standard_normal(n)) / np.sqrt(2)
        else:
            out[a:b] = rng.standard_normal(n)
    else:
        raise ValueError(f"unknown fault mode {mode!r}")
    return out


def _amplitude_for_cn0(cn0_dbhz: float, fs: float, noise_sigma: float) -> float:
    """Signal amplitude giving the requested C/N0 against complex noise of
    per-sample variance ``noise_sigma**2`` (N0 = sigma^2 / fs)."""
    return float(np.sqrt(10.0 ** (cn0_dbhz / 10.0) * noise_sigma**2 / fs))


def simulate_capture(
    sats: Sequence[SimSat],
    num_epochs: int,
    plan: SignalPlan = BASEBAND_PLAN,
    noise_sigma: float = 1.0,
    seed: int = 0,
    chunk_epochs: int = 2000,
) -> tuple:
    """Synthesize ``num_epochs`` ms of signal.

    Returns ``(samples, truth)``.  ``samples`` is complex64 of shape
    ``(num_epochs * samples_per_epoch,)`` for a complex plan, or float32
    (+/-1 if plan.quantize_bits == 1) for a real-IF plan.  Generation is
    chunked so float64 intermediates stay bounded on long captures.
    """
    spe = plan.samples_per_epoch
    out = []
    amps_out = None
    rng = np.random.default_rng(seed)
    for start in range(0, num_epochs, chunk_epochs):
        n_ep = min(chunk_epochs, num_epochs - start)
        chunk, amps = _simulate_chunk(
            sats, start * spe, n_ep * spe, plan, noise_sigma, rng
        )
        out.append(chunk)
        amps_out = amps
    truth = SimTruth(
        sats=list(sats),
        plan=plan,
        noise_sigma=noise_sigma,
        amplitudes=np.asarray(amps_out),
    )
    return np.concatenate(out), truth


def _simulate_chunk(sats, sample0: int, n: int, plan: SignalPlan,
                    noise_sigma: float, rng) -> tuple:
    fs = plan.sample_rate_hz
    t = (sample0 + np.arange(n, dtype=np.float64)) / fs

    total = np.zeros(n, dtype=np.complex128 if plan.complex_input else np.float64)
    amps = []

    for sat in sats:
        code = ca_code_bits(sat.prn)
        bipolar_code = (1 - 2 * code.astype(np.int8)).astype(np.float64)

        # Doppler chirp integral: f(t) = fd + rate*t  =>
        # carrier phase term fd*t + rate*t^2/2; the code rate follows
        # coherently via the same integral scaled by 1/fL1.
        dop_int = sat.doppler_hz * t + 0.5 * sat.doppler_rate_hz_s * t**2
        if sat.code_doppler:
            code_time = t + dop_int / FREQ_L1_HZ
        else:
            code_time = t
        if sat.delay_ms is not None:
            chip_total = CODE_RATE_HZ * (code_time - sat.delay_ms * 1e-3)
            epoch_offset = 0
        else:
            chip_total = sat.code_phase_chips + CODE_RATE_HZ * code_time
            epoch_offset = sat.nav_epoch_offset
        chip_idx = np.floor(chip_total).astype(np.int64)
        c = bipolar_code[chip_idx % CODE_LENGTH]

        # Nav-bit modulation: bit boundaries land on code-period boundaries
        # of the *transmitted* code (20 periods per bit, nav_data.c:15).
        period_idx = (
            np.floor_divide(chip_idx, CODE_LENGTH) + epoch_offset
        )
        if sat.nav_bits is not None:
            bits = np.asarray(sat.nav_bits, dtype=np.int64)
            bit_idx = np.floor_divide(period_idx, sat.codes_in_bit) % len(bits)
            d = (1 - 2 * bits[bit_idx]).astype(np.float64)
        else:
            d = 1.0

        amp = _amplitude_for_cn0(sat.cn0_dbhz, fs, noise_sigma)
        amps.append(amp)
        phase = (sat.carrier_phase_cycles + plan.if_freq_hz * t + dop_int)
        if plan.complex_input:
            total += amp * d * c * np.exp(2j * np.pi * phase)
        else:
            # Real IF signal; same C/N0 definition against real noise of
            # variance sigma^2 needs sqrt(2) amplitude scaling.
            total += amp * np.sqrt(2.0) * d * c * np.cos(2 * np.pi * phase)

    if plan.complex_input:
        noise = noise_sigma * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ) / np.sqrt(2.0)
        samples = (total + noise).astype(np.complex64)
    else:
        noise = noise_sigma * rng.standard_normal(n)
        samples = (total + noise).astype(np.float32)
        if plan.quantize_bits == 1:
            samples = np.where(samples >= 0, 1.0, -1.0).astype(np.float32)

    return samples, amps
