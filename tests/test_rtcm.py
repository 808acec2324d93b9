"""RTCM3 encoder/decoder round-trip tests (rtcm3e.c capability)."""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.io.rtcm3 import (
    MsmObs,
    crc24q,
    decode_1019,
    decode_msm,
    deframe,
    encode_1019,
    encode_msm,
    frame,
)

from tests.test_pvt import make_eph


def test_crc24q_known_vector():
    # poly 0x864CFB, init 0, no reflection: check value 0xCDE703
    # (the RTCM3 CRC-24Q parameterization; obs_publish.c:23-56 table)
    assert crc24q(b"123456789") == 0xCDE703


def test_frame_roundtrip_and_corruption():
    payload = bytes(range(40))
    f = frame(payload)
    assert f[0] == 0xD3
    assert deframe(f) == payload
    bad = bytearray(f)
    bad[10] ^= 0x40
    assert deframe(bytes(bad)) is None


def test_eph_1019_roundtrip():
    eph = make_eph(17, M0=-1.25, OMG0=2.5)
    eph.iodc, eph.iode = 123, 123
    eph.f0, eph.f1, eph.f2 = 2.5e-4, -3.5e-12, 1e-20
    payload = encode_1019(eph)
    f = frame(payload)
    got = decode_1019(deframe(f))
    assert got["sat"] == 17
    assert got["week"] == eph.week % 1024
    assert got["iode"] == 123 and got["iodc"] == 123
    assert got["M0"] == pytest.approx(eph.M0, abs=2 ** -31 * 3.15)
    assert got["e"] == pytest.approx(eph.e, abs=2 ** -33)
    assert got["sqrtA"] == pytest.approx(np.sqrt(eph.A), abs=2 ** -19)
    assert got["OMGd"] == pytest.approx(eph.OMGd, abs=2 ** -43 * 3.15)
    assert got["f0"] == pytest.approx(eph.f0, abs=2 ** -31)
    assert got["tgd"] == pytest.approx(eph.tgd, abs=2 ** -31)
    assert got["toes"] == eph.toes


@pytest.mark.parametrize("msg", [1074, 1075])
def test_msm_roundtrip(msg):
    obs = [
        MsmObs(sat=5, pseudorange_m=21_234_567.89, doppler_hz=1234.0,
               cn0_dbhz=44.0, lock_time_s=10.0,
               half_cycle_ambiguous=False),
        MsmObs(sat=12, pseudorange_m=23_456_789.01, doppler_hz=-2500.0,
               cn0_dbhz=39.0, lock_time_s=0.2),
        MsmObs(sat=30, pseudorange_m=25_000_123.45, doppler_hz=10.0,
               cn0_dbhz=47.0, lock_time_s=300.0,
               half_cycle_ambiguous=False),
    ]
    payload = encode_msm(msg, tow_s=345678.4, obs=obs)
    got = decode_msm(deframe(frame(payload)))
    assert got["msg"] == msg
    assert got["tow_ms"] == int(round(345678.4 * 1000))
    assert [o["sat"] for o in got["obs"]] == [5, 12, 30]
    for o_in, o_out in zip(obs, got["obs"]):
        # fine range resolution: 2^-24 ms ~ 1.8 cm
        assert o_out["pseudorange_m"] == pytest.approx(
            o_in.pseudorange_m, abs=0.05
        )
        assert o_out["cn0_dbhz"] == round(o_in.cn0_dbhz)
        # DF420 half-cycle ambiguity flag round-trips
        assert o_out["half_cycle_ambiguous"] == o_in.half_cycle_ambiguous
        if msg == 1075:
            want_rate = -o_in.doppler_hz * (299792458.0 / 1.57542e9)
            assert o_out["range_rate_ms"] == pytest.approx(
                want_rate, abs=0.01
            )


def test_status_render_smoke():
    from stm32f4_sdr_gps_tpu.config import ReceiverConfig
    from stm32f4_sdr_gps_tpu.io.status import PositionPlot, render_status
    from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver

    rx = Receiver(ReceiverConfig(prns=(1, 2)))
    s = render_status(rx)
    assert "PRN" in s and "no fix" in s

    plot = PositionPlot()
    rng = np.random.default_rng(0)
    base = np.array([np.radians(51.5), np.radians(-0.1), 80.0])
    for _ in range(20):
        jitter = np.array([rng.normal(0, 3e-6), rng.normal(0, 5e-6), 0.0])
        plot.add(base + jitter)
    art = plot.render()
    assert art.count("*") >= 1 and "+--------+" in art


def test_msm_rounding_carry_edge():
    """A fractional range that rounds up to the next 1/1024 ms boundary
    must carry into the integer-ms field, not wrap to zero."""
    from stm32f4_sdr_gps_tpu.config import CLIGHT

    # 70 ms minus a hair less than half a 1/1024 ms quantum
    rng_ms = 70.0 - 0.4 / 1024.0
    obs = [MsmObs(sat=1, pseudorange_m=rng_ms * CLIGHT / 1000.0)]
    got = decode_msm(deframe(frame(encode_msm(1074, 1000.0, obs))))
    assert got["obs"][0]["pseudorange_m"] == pytest.approx(
        obs[0].pseudorange_m, abs=0.05
    )


def test_msm_phaserange_roundtrip():
    obs = [MsmObs(sat=9, pseudorange_m=21_000_000.0, doppler_hz=500.0,
                  phaserange_m=21_000_000.8)]
    got = decode_msm(deframe(frame(encode_msm(1075, 100.0, obs))))
    o = got["obs"][0]
    assert o["phaserange_m"] == pytest.approx(21_000_000.8, abs=0.01)
    # absent phaserange decodes as 0
    obs2 = [MsmObs(sat=9, pseudorange_m=21_000_000.0)]
    got2 = decode_msm(deframe(frame(encode_msm(1074, 100.0, obs2))))
    assert got2["obs"][0]["phaserange_m"] == 0.0
