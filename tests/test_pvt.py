"""PVT solver tests: Kepler propagation, models, and position recovery."""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import CLIGHT
from stm32f4_sdr_gps_tpu.nav.ephemeris import Ephemeris
from stm32f4_sdr_gps_tpu.pvt.atmosphere import ionocorr, tropcorr
from stm32f4_sdr_gps_tpu.pvt.ephpos import eph2clk, eph2pos, satposs
from stm32f4_sdr_gps_tpu.pvt.gpstime import (
    gpst2time,
    time2gpst,
    timeadd,
    timediff,
)
from stm32f4_sdr_gps_tpu.pvt.solve import (
    Obs,
    ecef2pos,
    geodist,
    pntpos,
    pos2ecef,
    satazel,
)

WEEK = 2290
TOE = 352800.0


def make_eph(sat, M0, OMG0, i0=0.96, e=0.01, omg=0.5):
    eph = Ephemeris(sat=sat)
    eph.A = 26560278.1
    eph.e = e
    eph.i0 = i0
    eph.OMG0 = OMG0
    eph.omg = omg
    eph.M0 = M0
    eph.deln = 4.0e-09
    eph.OMGd = -8.0e-09
    eph.idot = -5e-10
    eph.crc, eph.crs = 200.0, -100.0
    eph.cuc, eph.cus = -5e-06, 5e-06
    eph.cic, eph.cis = -1e-08, 1e-07
    eph.toes = TOE
    eph.toe = gpst2time(WEEK, TOE)
    eph.toc = gpst2time(WEEK, TOE)
    eph.f0, eph.f1, eph.f2 = 2.5e-04, -3.5e-12, 0.0
    eph.tgd = -1.2e-08
    eph.sva = 2
    eph.week = WEEK
    eph.received_mask_proc = 0x7
    return eph


def test_gpstime_roundtrip():
    t = gpst2time(WEEK, 123456.789)
    tow, week = time2gpst(t)
    assert week == WEEK
    assert tow == pytest.approx(123456.789, abs=1e-6)
    t2 = timeadd(t, -0.25)
    assert timediff(t2, t) == pytest.approx(-0.25, abs=1e-9)


def test_eph2pos_orbit_radius():
    eph = make_eph(1, M0=0.3, OMG0=1.0)
    t = gpst2time(WEEK, TOE + 120.0)
    pos, dts, var = eph2pos(t, eph)
    r = np.linalg.norm(pos)
    # orbit radius within A*(1 +/- e) plus harmonic corrections
    assert eph.A * (1 - 2 * eph.e) < r < eph.A * (1 + 2 * eph.e)
    assert abs(dts - 2.5e-04) < 1e-5   # clock poly dominates
    assert var > 0


def test_eph2clk_inverts_polynomial():
    eph = make_eph(1, M0=0.0, OMG0=0.0)
    t = gpst2time(WEEK, TOE + 10.0)
    dts = eph2clk(t, eph)
    # forward-evaluate at corrected time: consistency to sub-ns
    tk = timediff(t, eph.toc) - dts
    assert dts == pytest.approx(eph.f0 + eph.f1 * tk, abs=1e-12)


def test_ecef_geodetic_roundtrip():
    pos = np.array([np.radians(52.1), np.radians(4.3), 61.0])
    r = pos2ecef(pos)
    back = ecef2pos(r)
    assert np.allclose(back[:2], pos[:2], atol=1e-9)
    assert back[2] == pytest.approx(61.0, abs=1e-3)


def test_models_reasonable():
    pos = np.array([np.radians(45.0), np.radians(7.0), 200.0])
    t = gpst2time(WEEK, 43200.0)
    for el_deg in (15.0, 45.0, 90.0):
        azel = np.array([1.0, np.radians(el_deg)])
        dion, vion = ionocorr(t, None, pos, azel)
        dtrp, vtrp = tropcorr(pos, azel)
        assert 0.5 < dion < 40.0
        assert 1.5 < dtrp < 30.0
        assert vion >= 0 and vtrp > 0


def _forward_pseudorange(obs_time, eph, rr, dtr_s, eph_map):
    """Fixed-point: P such that the solver's residual model is zero."""
    from stm32f4_sdr_gps_tpu.pvt.atmosphere import ionocorr, tropcorr

    P = 2.2e7
    pos = ecef2pos(rr)
    for _ in range(8):
        o = Obs(sat=eph.sat, time=obs_time, P=P)
        rs, dts, var, svh, ok = satposs(obs_time, [o], eph_map)
        r, e = geodist(rs[0], rr)
        azel = satazel(pos, e)
        dion, _ = ionocorr(obs_time, None, pos, azel)
        dtrp, _ = tropcorr(pos, azel)
        P = (r + dion + dtrp + CLIGHT * dtr_s - CLIGHT * dts[0][0]
             + CLIGHT * eph.tgd)
    return P


def test_pntpos_recovers_position():
    """Solver must recover a known receiver position from self-consistent
    pseudoranges of 6 satellites (cm-level: the forward model is the
    solver's own)."""
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    dtr_true = 3.2e-4   # receiver clock bias, s
    obs_time = gpst2time(WEEK, TOE + 60.0)

    sats = []
    # (M0, OMG0) pairs giving 6 satellites above 15 deg elevation with
    # spread azimuths as seen from the test location.
    geom = [
        (1.5, 4.65), (1.0, 5.17), (0.5, 0.0), (1.0, 5.68),
        (1.5, 4.13), (2.0, 4.13),
    ]
    eph_map = {}
    for k, (m0, omg0) in enumerate(geom, start=1):
        eph = make_eph(k, M0=m0, OMG0=omg0)
        eph_map[k] = eph
        sats.append(eph)

    obs = []
    for eph in sats:
        P = _forward_pseudorange(obs_time, eph, rr_true, dtr_true, eph_map)
        # keep only satellites above horizon
        o = Obs(sat=eph.sat, time=obs_time, P=P)
        rs, dts, var, svh, ok = satposs(obs_time, [o], eph_map)
        r, e = geodist(rs[0], rr_true)
        if satazel(ecef2pos(rr_true), e)[1] > np.radians(10.0):
            obs.append(o)
    assert len(obs) >= 4, "test geometry must give >=4 visible sats"

    sol = pntpos(obs, eph_map)
    assert sol.ok
    err = np.linalg.norm(sol.rr - rr_true)
    assert err < 0.1, f"position error {err} m"
    assert sol.dtr_s == pytest.approx(dtr_true, abs=1e-9)
    assert sol.ns == len(obs)
    assert np.max(np.abs(sol.residuals[: len(obs)])) < 0.05


def test_pntpos_fails_gracefully_with_few_sats():
    eph_map = {1: make_eph(1, 0.3, 0.9)}
    t = gpst2time(WEEK, TOE + 60.0)
    sol = pntpos([Obs(sat=1, time=t, P=2.2e7)], eph_map)
    assert not sol.ok


def test_hatch_smoothing_reduces_code_noise():
    """Carrier-propagated Hatch filter: smoothed pseudorange noise well
    below raw code noise when the carrier is clean."""
    from stm32f4_sdr_gps_tpu.pvt.observables import HatchState, LAMBDA_L1_M

    rng = np.random.default_rng(0)
    n = 200
    true_range = 2.1e7 + np.cumsum(np.full(n, -0.4))   # closing at 0.4 m/step
    code = true_range + rng.normal(0, 15.0, n)          # 15 m code noise
    carrier_cycles = -(true_range - true_range[0]) / LAMBDA_L1_M

    h = HatchState(window=100)
    smoothed = np.array([h.update(code[k], carrier_cycles[k])
                         for k in range(n)])
    raw_err = code[50:] - true_range[50:]
    sm_err = smoothed[50:] - true_range[50:]
    assert np.std(sm_err) < np.std(raw_err) / 3.0


def test_hatch_resets_on_divergence():
    from stm32f4_sdr_gps_tpu.pvt.observables import HatchState

    h = HatchState()
    h.update(2.0e7, 0.0)
    h.update(2.0e7 + 1.0, 0.0)
    assert h.count == 2
    # 1 km jump with no carrier change -> reset, output follows the code
    out = h.update(2.0e7 + 1000.0, 0.0)
    assert out == 2.0e7 + 1000.0
    assert h.count == 1


def test_velocity_solution_static_receiver():
    """Doppler consistent with satellite range rates must solve to
    ~zero receiver velocity (firmware leaves velocity unsolved)."""
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    obs_time = gpst2time(WEEK, TOE + 60.0)
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.5, 3.62), (1.0, 5.68)]
    lam = CLIGHT / 1.57542e9
    eph_map = {k: make_eph(k, M0=m0, OMG0=o0)
               for k, (m0, o0) in enumerate(geom, start=1)}
    obs = []
    drift_mps = 1.7       # receiver clock drift, m/s equivalent
    for k, eph in eph_map.items():
        P = _forward_pseudorange(obs_time, eph, rr_true, 1e-4, eph_map)
        o = Obs(sat=k, time=obs_time, P=P)
        rs, dts, var, svh, ok = satposs(obs_time, [o], eph_map)
        r, e = geodist(rs[0], rr_true)
        rdot = float(e @ rs[0][3:6]) + drift_mps
        o.D = -rdot / lam
        obs.append(o)
    sol = pntpos(obs, eph_map)
    assert sol.ok and sol.vel is not None
    assert np.linalg.norm(sol.vel) < 0.1, sol.vel
    assert sol.dtr_drift_s * CLIGHT == pytest.approx(drift_mps, abs=0.05)


def test_raim_excludes_faulty_satellite():
    """RAIM: with 6 satellites and one pseudorange biased by 500 m, the
    faulty satellite is identified and excluded (fault identification
    needs >= 6 — with 5, any exclusion leaves an exact fit)."""
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    obs_time = gpst2time(WEEK, TOE + 60.0)
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.5, 3.62),
            (1.0, 5.68), (1.0, 5.17)]
    eph_map = {k: make_eph(k, M0=m0, OMG0=o0)
               for k, (m0, o0) in enumerate(geom, start=1)}
    obs = []
    for k, eph in eph_map.items():
        P = _forward_pseudorange(obs_time, eph, rr_true, 1e-4, eph_map)
        obs.append(Obs(sat=k, time=obs_time, P=P))
    obs[2].P += 500.0   # fault on PRN 3

    sol_no_raim = pntpos(obs, eph_map)
    assert sol_no_raim.ok
    err_no = np.linalg.norm(sol_no_raim.rr - rr_true)
    assert err_no > 100.0   # the fault leaks into the fix

    sol = pntpos(obs, eph_map, raim_threshold_m=10.0)
    assert sol.ok
    assert sol.excluded_sat == 3
    err = np.linalg.norm(sol.rr - rr_true)
    assert err < 1.0, err


def test_velocity_skips_missing_doppler():
    """D == 0.0 means "Doppler unavailable"; such an observation must be
    excluded from the velocity fit, not used as a real 0 Hz range rate
    (real range rates are hundreds of m/s, so including it would throw
    the velocity solution by km/s)."""
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    obs_time = gpst2time(WEEK, TOE + 60.0)
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.5, 3.62),
            (1.0, 5.68), (1.0, 5.17)]
    lam = CLIGHT / 1.57542e9
    eph_map = {k: make_eph(k, M0=m0, OMG0=o0)
               for k, (m0, o0) in enumerate(geom, start=1)}
    obs = []
    for k, eph in eph_map.items():
        P = _forward_pseudorange(obs_time, eph, rr_true, 1e-4, eph_map)
        o = Obs(sat=k, time=obs_time, P=P)
        rs, dts, var, svh, ok = satposs(obs_time, [o], eph_map)
        r, e = geodist(rs[0], rr_true)
        o.D = -float(e @ rs[0][3:6]) / lam
        obs.append(o)
    obs[-1].D = 0.0     # Doppler never measured on this channel
    sol = pntpos(obs, eph_map)
    assert sol.ok and sol.vel is not None
    assert np.linalg.norm(sol.vel) < 0.1, sol.vel


def test_residuals_align_with_contributing_sats():
    """sol.residuals must hold exactly the ns contributing residuals —
    an excluded (unhealthy) satellite or the solver's constraint rows
    must not dilute the RMS used by RAIM / the receiver's residual
    gate."""
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    obs_time = gpst2time(WEEK, TOE + 60.0)
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.5, 3.62),
            (1.0, 5.68), (1.0, 5.17)]
    eph_map = {k: make_eph(k, M0=m0, OMG0=o0)
               for k, (m0, o0) in enumerate(geom, start=1)}
    obs = []
    for k, eph in eph_map.items():
        P = _forward_pseudorange(obs_time, eph, rr_true, 1e-4, eph_map)
        obs.append(Obs(sat=k, time=obs_time, P=P))
    eph_map[6].svh = 1          # flagged unhealthy -> skipped by rescode
    # give the unhealthy sat a wildly wrong pseudorange: it must not
    # appear in the residual vector at all
    obs[-1].P += 1.0e5
    sol = pntpos(obs, eph_map)
    assert sol.ok
    assert sol.ns == len(obs) - 1
    assert len(sol.residuals) == sol.ns
    assert float(np.sqrt(np.mean(sol.residuals ** 2))) < 0.05


def _four_sat_obs(with_doppler=False):
    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    obs_time = gpst2time(WEEK, TOE + 60.0)
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.0, 5.68)]
    eph_map = {k: make_eph(k, M0=m0, OMG0=o0)
               for k, (m0, o0) in enumerate(geom, start=1)}
    lam = CLIGHT / 1.57542e9
    obs = []
    for k, eph in eph_map.items():
        P = _forward_pseudorange(obs_time, eph, rr_true, 1e-4, eph_map)
        o = Obs(sat=k, time=obs_time, P=P)
        if with_doppler:
            rs, dts, var, svh, ok = satposs(obs_time, [o], eph_map)
            r, e = geodist(rs[0], rr_true)
            o.D = -(float(e @ rs[0][3:6]) + 1.7) / lam
        obs.append(o)
    return rr_true, obs_time, eph_map, obs


def test_plausibility_gate_catches_4sat_grid_fault():
    """A single channel's 3 ms grid fault at exactly 4 satellites
    converges with ZERO residuals (4 obs / 4 unknowns) but lands
    thousands of km off — only the physical gate can see it."""
    from stm32f4_sdr_gps_tpu.pvt.solve import solution_plausible

    rr_true, obs_time, eph_map, obs = _four_sat_obs()
    sol_good = pntpos(obs, eph_map)
    assert sol_good.ok and solution_plausible(sol_good)

    obs[2].P += 3e-3 * CLIGHT
    sol_bad = pntpos(obs, eph_map)
    assert sol_bad.ok                                     # converged...
    assert float(np.sqrt(np.mean(sol_bad.residuals**2))) < 1.0  # ...cleanly
    assert np.linalg.norm(sol_bad.rr - rr_true) > 100e3   # ...wrongly
    assert not solution_plausible(sol_bad)                # caught


def test_identify_grid_fault_unique():
    """With Doppler observations (the receiver always has them) the
    hypothesis search identifies the faulty channel uniquely: any
    wrong-position hypothesis implies a km/s phantom receiver velocity
    that the speed gate kills."""
    from stm32f4_sdr_gps_tpu.pvt.solve import identify_grid_fault

    rr_true, obs_time, eph_map, obs = _four_sat_obs(with_doppler=True)
    # channel 2's boundary ledger is 3 ms late -> pseudorange 3 ms long
    obs[2].P += 3e-3 * CLIGHT
    hit = identify_grid_fault(obs, eph_map)
    assert hit is not None, "fault not identified"
    sol, idx, shift_ms = hit
    assert idx == 2 and shift_ms == -3
    assert np.linalg.norm(sol.rr - rr_true) < 1.0

    # healthy set: no hypothesis should survive (nothing to 'fix')
    rr_true, obs_time, eph_map, obs = _four_sat_obs(with_doppler=True)
    assert identify_grid_fault(obs, eph_map) is None


def test_speed_gate_kills_phantom_velocity_hypothesis():
    """Without the Doppler speed gate, a wrong hypothesis on a healthy
    4-sat set can land at plausible altitude/clock (observed: 43 km /
    -9 ms) — the implied 5.4 km/s receiver velocity is what rejects
    it."""
    from stm32f4_sdr_gps_tpu.pvt.solve import pntpos as _pntpos
    from stm32f4_sdr_gps_tpu.pvt.solve import solution_plausible

    rr_true, obs_time, eph_map, obs = _four_sat_obs(with_doppler=True)
    obs[3].P += -2e-3 * CLIGHT
    sol = _pntpos(obs, eph_map)
    assert sol.ok
    assert sol.vel is not None and np.linalg.norm(sol.vel) > 1000.0
    assert not solution_plausible(sol)
    assert solution_plausible(sol, max_speed_mps=0.0), \
        "this scenario is exactly the one only the speed gate catches"


def test_ephemeris_age_gate():
    """Satellites whose ephemeris is older than MAXDTOE (7200 s) drop
    out of satposs like unhealthy ones (RTKLIB satpos semantics; the
    firmware, running minutes at a time, never hits this — a
    long-running framework job does)."""
    from stm32f4_sdr_gps_tpu.pvt.gpstime import timeadd

    rr_true, obs_time, eph_map, obs = _four_sat_obs()
    assert pntpos(obs, eph_map).ok

    eph = eph_map[obs[0].sat]
    eph.toe = timeadd(eph.toe, -8000.0)
    rs, dts, var, svh, ok = satposs(obs_time, obs, eph_map)
    assert not ok[0] and ok[1:].all()
    # 3 usable satellites left: the solve must refuse, not extrapolate
    assert not pntpos(obs, eph_map).ok


def test_degenerate_geometry_fails_cleanly():
    """Coincident satellites make the normal matrix singular; the
    solver must return ok=False, never raise (LinAlgError out of the
    receiver loop was a crash path found by tools/host_cost_probe)."""
    from stm32f4_sdr_gps_tpu.pvt.solve import Obs, pntpos
    from stm32f4_sdr_gps_tpu.pvt.gpstime import gpst2time

    eph = make_eph(1, 1.0, 0.5)
    t = gpst2time(eph.week, eph.toes + 60.0)
    # four observations of the SAME satellite position (duplicate eph)
    obs = [Obs(sat=s, time=t, P=2.2e7 + 10.0 * i, D=0.0, snr=45.0)
           for i, s in enumerate((1, 2, 3, 4))]
    eph_map = {}
    for s in (1, 2, 3, 4):
        import copy

        e = copy.deepcopy(eph)
        e.sat = s
        eph_map[s] = e
    sol = pntpos(obs, eph_map)
    assert not sol.ok
