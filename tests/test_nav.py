"""Nav message chain tests: encoder -> framer -> ephemeris decode.

Bit-exactness target of BASELINE.md: parity equations and subframe field
maps must round-trip through the same rules the firmware implements
(nav_data.c:433-453, nav_data_decode.c:53-126).
"""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.nav.ephemeris import Ephemeris, decode_subframe
from stm32f4_sdr_gps_tpu.nav.frame import NavFramer, check_parity
from stm32f4_sdr_gps_tpu.signal.nav_message import (
    build_bitstream,
    encode_word,
)

TEST_EPH = dict(
    week=2290,
    iodc=57,
    iode=57,
    sva=2,
    svh=0,
    tgd=-1.2107193470e-08,
    toc_s=352800.0,
    f0=2.5634365156e-04,
    f1=-3.5242919693e-12,
    f2=0.0,
    crs=-115.21875,
    deln=4.0465882771e-09,
    M0=-2.2314427737,
    cuc=-6.0573220253e-06,
    e=0.0110899875,
    cus=5.1585957408e-06,
    A=26560278.1,
    toes=352800.0,
    fit=0,
    cic=-1.1175870895e-08,
    OMG0=-0.5971402355,
    cis=1.1548399925e-07,
    i0=0.9884864476,
    crc=287.46875,
    omg=0.6811469216,
    OMGd=-8.1625543586e-09,
    idot=-4.8930396158e-10,
)


def _feed(framer, bits, t0=0):
    events = []
    for i, b in enumerate(bits):
        events.extend(framer.push_bit(int(b), t0 + i * 20))
    return events


def test_word_roundtrip_parity():
    rng = np.random.default_rng(0)
    d29, d30 = 0, 0
    for _ in range(50):
        data = rng.integers(0, 2, 24).tolist()
        tx = encode_word(data, d29, d30)
        got = check_parity(tx, d29, d30)
        assert got == data
        d29, d30 = tx[28], tx[29]


def test_parity_rejects_bit_errors():
    data = [1, 0] * 12
    tx = encode_word(data, 0, 0)
    for flip in (0, 5, 24, 29):
        bad = list(tx)
        bad[flip] ^= 1
        assert check_parity(bad, 0, 0) is None


def test_subframe_framing_and_decode():
    bits = build_bitstream(TEST_EPH, start_tow_6s=58800, num_subframes=5)
    framer = NavFramer()
    events = _feed(framer, bits)
    assert len(events) == 5
    assert [e.subframe_id for e in events] == [1, 2, 3, 4, 5]
    # subframe start epochs spaced 6 s apart
    starts = [e.start_epoch_ms for e in events]
    assert all(b - a == 6000 for a, b in zip(starts, starts[1:]))

    eph = Ephemeris(sat=1)
    for e in events:
        decode_subframe(e.bits, eph)
    assert eph.has_full_set
    assert eph.week == TEST_EPH["week"]
    assert eph.iodc == TEST_EPH["iodc"]
    assert eph.iode == TEST_EPH["iode"]
    assert eph.svh == TEST_EPH["svh"]
    rel = lambda k, tol: abs(getattr(eph, k) - TEST_EPH[k]) <= tol
    assert rel("f0", 2**-31)
    assert rel("f1", 2**-43)
    assert rel("tgd", 2**-31)
    assert rel("M0", 2**-31 * 3.15)
    assert rel("e", 2**-33)
    assert rel("A", 1.0)
    assert rel("OMG0", 2**-31 * 3.15)
    assert rel("i0", 2**-31 * 3.15)
    assert rel("omg", 2**-31 * 3.15)
    assert rel("OMGd", 2**-43 * 3.15)
    assert rel("idot", 2**-43 * 3.15)
    assert rel("crs", 2**-5)
    assert rel("crc", 2**-5)
    assert rel("cuc", 2**-29)
    assert rel("cus", 2**-29)
    assert rel("cic", 2**-29)
    assert rel("cis", 2**-29)
    assert eph.toes == TEST_EPH["toes"]
    # TOW of the last decoded subframe (HOW carries next-boundary TOW)
    assert eph.tow_gpst == (58800 + 5) * 6.0


def test_inverted_polarity_recovery():
    """180-degree phase flip: all bits inverted; the framer must detect
    the inverted preamble and still decode (nav_data.c:281-291)."""
    bits = build_bitstream(TEST_EPH, start_tow_6s=100, num_subframes=4)
    inv = 1 - bits
    framer = NavFramer()
    events = _feed(framer, inv)
    assert framer.inv_polarity
    assert len(events) >= 3
    eph = Ephemeris(sat=1)
    for e in events:
        decode_subframe(e.bits, eph)
    assert eph.iode == TEST_EPH["iode"]


def test_resync_after_bit_error():
    """A corrupted bit kills one word's parity; framing must re-sync on
    the next subframe (nav_data.c:344-347)."""
    bits = build_bitstream(TEST_EPH, start_tow_6s=200, num_subframes=4)
    bad = bits.copy()
    bad[40] ^= 1  # corrupt word 2 of subframe 1
    framer = NavFramer()
    events = _feed(framer, bad)
    ids = [e.subframe_id for e in events]
    assert 1 not in ids          # first subframe lost
    assert ids[:3] == [2, 3, 4]  # rest recovered


def test_random_bits_no_false_subframes():
    rng = np.random.default_rng(7)
    framer = NavFramer()
    events = _feed(framer, rng.integers(0, 2, 3000))
    # preamble hits happen, but parity chains must kill them
    assert len(events) == 0


def test_leading_garbage_then_stream():
    rng = np.random.default_rng(9)
    garbage = rng.integers(0, 2, 137)
    bits = build_bitstream(TEST_EPH, start_tow_6s=300, num_subframes=3)
    framer = NavFramer()
    events = _feed(framer, np.concatenate([garbage, bits]))
    assert [e.subframe_id for e in events][:3] == [1, 2, 3]
    # subframe start epoch accounts for the garbage prefix
    assert events[0].start_epoch_ms == 137 * 20


def test_mixed_dataset_held_out_of_pvt():
    """Broadcast dataset cutover: once a new-IODE subframe lands, the
    half-updated ephemeris (sf2 from dataset B, sf1/sf3 still A) must
    NOT count as a full set — IS-GPS-200 matched-dataset rule.  The
    firmware's oldiode check is commented out (nav_data_decode.c:85,
    :109) and it would mix datasets here."""
    a = dict(TEST_EPH)
    b = dict(TEST_EPH, iodc=58, iode=58, toes=360000.0, toc_s=360000.0)

    def events(eph_dict, tow6):
        bits = build_bitstream(eph_dict, start_tow_6s=tow6,
                               num_subframes=3, subframe_ids=(1, 2, 3))
        return _feed(NavFramer(), bits)

    ev_a = events(a, 58800)
    ev_b = events(b, 60000)

    eph = Ephemeris(sat=1)
    for e in ev_a:
        decode_subframe(e.bits, eph)
    assert eph.has_full_set and eph.dataset_consistent

    decode_subframe(ev_b[1].bits, eph)      # sf2, IODE 58 arrives first
    assert not eph.has_full_set             # sf3 (57) / sf1 (IODC 57)
    decode_subframe(ev_b[2].bits, eph)      # sf3, IODE 58
    assert not eph.has_full_set             # sf1 IODC still 57
    decode_subframe(ev_b[0].bits, eph)      # sf1, IODC 58
    assert eph.has_full_set
    assert eph.toes == 360000.0
