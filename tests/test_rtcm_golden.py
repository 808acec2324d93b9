"""RTCM3 golden-frame cross-validation (VERDICT r2 weak-3).

io/rtcm3.py was previously only round-trip-tested against its own
decoder — a systematic field-order or sign error would pass.  This file
hand-builds golden frames with an INDEPENDENT bit writer and CRC
implementation (no code shared with io/rtcm3.py or io/bits.py),
following the reference encoder's documented bit layout field by field
(encode_type1019 rtcm3e.c:156-222; MSM header rtcm3e.c:382-418;
satellite/signal fields rtcm3e.c:429-565; framing obs_publish.c:101-136)
and asserts BYTE EQUALITY with our encoder's output.

Known intentional divergences from the firmware (values, not layout):
* DF402 lock-time indicator: the firmware feeds locktime() SECONDS into
  to_msm_lock()'s millisecond table (rtcm3e.c:112-151), so a 10 s lock
  encodes as indicator 0 there; we implement the standard table in ms
  (10 s -> 9).  The golden frame uses the standard mapping.
* DF137 fit flag: our Ephemeris carries the decoded subframe-2 flag
  verbatim; the firmware's eph_t.fit is a fit interval in hours mapped
  fit>0 ? 0 : 1 (rtcm3e.c:220).
* The MSM header's session-time field (DF393 area, 7 bits) is always 0
  here; the firmware writes to_lock(session seconds).
"""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import CLIGHT
from stm32f4_sdr_gps_tpu.io.rtcm3 import MsmObs, encode_1019, encode_msm, frame

from tests.test_pvt import make_eph


class GoldenBits:
    """Independent MSB-first bit accumulator (setbitu/setbits of
    rtcm3e.c:40-70 semantics)."""

    def __init__(self):
        self.bits = []

    def u(self, value, width):
        assert 0 <= value < (1 << width), (value, width)
        for k in range(width - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def s(self, value, width):
        assert -(1 << (width - 1)) <= value < (1 << (width - 1))
        self.u(value & ((1 << width) - 1), width)

    def bytes(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def golden_crc24q(data: bytes) -> int:
    """Bitwise CRC-24Q (poly 0x1864CFB, init 0) — no table, no shared
    code with io/rtcm3.crc24q."""
    crc = 0
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            top = (crc >> 23) & 1
            crc = ((crc << 1) & 0xFFFFFF)
            if top ^ bit:
                crc ^= 0x864CFB
    return crc


def golden_frame(payload: bytes) -> bytes:
    body = bytes([0xD3, len(payload) >> 8, len(payload) & 0xFF]) + payload
    crc = golden_crc24q(body)
    return body + bytes([crc >> 16, (crc >> 8) & 0xFF, crc & 0xFF])


# exact-grid 1019 integers (DF scales from rtcm3e.c:165-187); the eph
# fields are set to integer * scale so quantization is unambiguous
E1019 = dict(
    prn=17, week=2290, sva=2, code=0, idot=-500, iode=33, toc=22050,
    f2=0, f1=-27, f0=381774, iodc=33, crs=-2577, deln=9577,
    M0=549755813, cuc=-3277, e=106038135, cus=2795, sqrtA=2702999141,
    toe=22050, cic=-96, OMG0=412316860, cis=944, i0=654311424, crc=8005,
    omg=478150656, OMGd=-71300, tgd=0, svh=0, flag=0, fit=1,
)
SC2RAD = 3.1415926535898


def _eph_from_grid(g):
    eph = make_eph(g["prn"], M0=0.0, OMG0=0.0)
    eph.week = g["week"]
    eph.sva, eph.code, eph.svh, eph.flag, eph.fit = (
        g["sva"], g["code"], g["svh"], g["flag"], g["fit"])
    eph.iode, eph.iodc = g["iode"], g["iodc"]
    eph.idot = g["idot"] * 2.0 ** -43 * SC2RAD
    eph.f2 = g["f2"] * 2.0 ** -55
    eph.f1 = g["f1"] * 2.0 ** -43
    eph.f0 = g["f0"] * 2.0 ** -31
    eph.crs = g["crs"] * 2.0 ** -5
    eph.crc = g["crc"] * 2.0 ** -5
    eph.deln = g["deln"] * 2.0 ** -43 * SC2RAD
    eph.M0 = g["M0"] * 2.0 ** -31 * SC2RAD
    eph.cuc = g["cuc"] * 2.0 ** -29
    eph.cus = g["cus"] * 2.0 ** -29
    eph.cic = g["cic"] * 2.0 ** -29
    eph.cis = g["cis"] * 2.0 ** -29
    eph.e = g["e"] * 2.0 ** -33
    eph.A = (g["sqrtA"] * 2.0 ** -19) ** 2
    eph.toes = g["toe"] * 16.0
    eph.OMG0 = g["OMG0"] * 2.0 ** -31 * SC2RAD
    eph.i0 = g["i0"] * 2.0 ** -31 * SC2RAD
    eph.omg = g["omg"] * 2.0 ** -31 * SC2RAD
    eph.OMGd = g["OMGd"] * 2.0 ** -43 * SC2RAD
    eph.tgd = g["tgd"] * 2.0 ** -31
    # toc as gpst seconds-of-week (make_eph stores a gtime the encoder
    # converts via time2gpst)
    from stm32f4_sdr_gps_tpu.pvt.gpstime import gpst2time

    eph.toc = gpst2time(g["week"], g["toc"] * 16.0)
    return eph


def test_1019_matches_reference_bit_layout():
    """Byte-for-byte equality with a hand-built frame following
    encode_type1019's field order and widths (rtcm3e.c:189-221)."""
    g = E1019
    b = GoldenBits()
    b.u(1019, 12)
    b.u(g["prn"], 6)
    b.u(g["week"] % 1024, 10)
    b.u(g["sva"], 4)
    b.u(g["code"], 2)
    b.s(g["idot"], 14)
    b.u(g["iode"], 8)
    b.u(g["toc"], 16)
    b.s(g["f2"], 8)
    b.s(g["f1"], 16)
    b.s(g["f0"], 22)
    b.u(g["iodc"], 10)
    b.s(g["crs"], 16)
    b.s(g["deln"], 16)
    b.s(g["M0"], 32)
    b.s(g["cuc"], 16)
    b.u(g["e"], 32)
    b.s(g["cus"], 16)
    b.u(g["sqrtA"], 32)
    b.u(g["toe"], 16)
    b.s(g["cic"], 16)
    b.s(g["OMG0"], 32)
    b.s(g["cis"], 16)
    b.s(g["i0"], 32)
    b.s(g["crc"], 16)
    b.s(g["omg"], 32)
    b.s(g["OMGd"], 24)
    b.s(g["tgd"], 8)
    b.u(g["svh"], 6)
    b.u(g["flag"], 1)
    b.u(g["fit"], 1)
    golden = golden_frame(b.bytes())

    ours = frame(encode_1019(_eph_from_grid(g)))
    assert ours == golden


def test_msm5_matches_reference_bit_layout():
    """Byte-for-byte equality of a 2-satellite GPS L1C/A MSM5 frame
    against the reference layout: header (rtcm3e.c:398-418), rough
    ranges (:429-467), rough rates (:543-557), fine pseudorange (:469-487),
    fine phaserange (:489-507), DF402/DF420/CNR (:509-541), fine rates."""
    lam = CLIGHT / 1.57542e9
    range_ms = CLIGHT * 1e-3
    tow_s = 123456.789

    # sat 5: range exactly on the 1/1024 ms grid + 12.5 m fine part,
    # valid phaserange; sat 12: grid + negative fine part, no phase
    u5, u12 = 73000, 75321                    # rough range, 1/1024 ms
    fine5_m, fine12_m = 12.5, -7.25
    p5 = u5 / 1024.0 * range_ms + fine5_m
    p12 = u12 / 1024.0 * range_ms + fine12_m
    l5 = p5 + 0.8                             # phaserange, m
    d5, d12 = -1000.0, 2345.0                 # Doppler Hz

    obs = [
        MsmObs(sat=5, pseudorange_m=p5, doppler_hz=d5, cn0_dbhz=44.0,
               lock_time_s=10.0, phaserange_m=l5,
               half_cycle_ambiguous=False),
        MsmObs(sat=12, pseudorange_m=p12, doppler_hz=d12, cn0_dbhz=39.0,
               lock_time_s=0.2),
    ]
    ours = frame(encode_msm(1075, tow_s, obs))

    b = GoldenBits()
    b.u(1075, 12)
    b.u(0, 12)                                # station id
    b.u(int(round(tow_s * 1000.0)), 30)       # GPS epoch time, ms
    b.u(0, 1)                                 # multiple message bit
    b.u(0, 3)                                 # IODS
    b.u(0, 7)                                 # session time (0 here)
    b.u(0, 2)                                 # clock steering
    b.u(0, 2)                                 # external clock
    b.u(0, 1)                                 # smoothing
    b.u(0, 3)                                 # smoothing interval
    sat_mask = (1 << (64 - 5)) | (1 << (64 - 12))
    b.u(sat_mask, 64)
    b.u(1 << (32 - 2), 32)                    # signal mask: L1 C/A (id 2)
    b.u(1, 1)                                 # cell mask sat 5
    b.u(1, 1)                                 # cell mask sat 12
    # satellite data: integer ms, extended info, mod-1ms, rough rates
    for u in (u5, u12):
        b.u(u >> 10, 8)
    for _ in (u5, u12):
        b.u(0, 4)
    for u in (u5, u12):
        b.u(u & 0x3FF, 10)
    rate5 = -d5 * lam
    rate12 = -d12 * lam
    b.s(int(round(rate5)), 14)
    b.s(int(round(rate12)), 14)
    # signal data: fine pseudorange (2^-24 ms), fine phaserange
    # (2^-29 ms), lock, half-cycle, CNR, fine rate (0.0001 m/s)
    b.s(int(round((p5 / range_ms - u5 / 1024.0) / 2.0 ** -24)), 15)
    b.s(int(round((p12 / range_ms - u12 / 1024.0) / 2.0 ** -24)), 15)
    b.s(int(round((l5 / range_ms - u5 / 1024.0) / 2.0 ** -29)), 22)
    b.s(-(1 << 21), 22)                       # phase invalid marker
    b.u(9, 4)                                 # 10 s -> DF402 indicator 9
    b.u(3, 4)                                 # 0.2 s (200 ms) -> 3
    b.u(0, 1)                                 # half-cycle resolved
    b.u(1, 1)                                 # half-cycle ambiguous
    b.u(44, 6)
    b.u(39, 6)
    b.s(int(round((rate5 - int(round(rate5))) / 1e-4)), 15)
    b.s(int(round((rate12 - int(round(rate12))) / 1e-4)), 15)
    golden = golden_frame(b.bytes())
    assert ours == golden


def test_msm4_matches_reference_bit_layout():
    """MSM4 drops the satellite extended-info/rough-rate and fine-rate
    fields (encode_msm4 vs encode_msm5, rtcm3e.c:567-641)."""
    range_ms = CLIGHT * 1e-3
    u9 = 69888
    p9 = u9 / 1024.0 * range_ms + 3.0
    obs = [MsmObs(sat=9, pseudorange_m=p9, cn0_dbhz=47.0,
                  lock_time_s=300.0)]
    ours = frame(encode_msm(1074, 2000.0, obs))

    b = GoldenBits()
    b.u(1074, 12)
    b.u(0, 12)
    b.u(2000000, 30)
    b.u(0, 1 + 3 + 7 + 2 + 2 + 1 + 3)
    b.u(1 << (64 - 9), 64)
    b.u(1 << (32 - 2), 32)
    b.u(1, 1)
    b.u(u9 >> 10, 8)
    b.u(u9 & 0x3FF, 10)
    b.s(int(round((p9 / range_ms - u9 / 1024.0) / 2.0 ** -24)), 15)
    b.s(-(1 << 21), 22)
    b.u(14, 4)                                # 300 s (3e5 ms) -> 14
    b.u(1, 1)
    b.u(47, 6)
    golden = golden_frame(b.bytes())
    assert ours == golden
