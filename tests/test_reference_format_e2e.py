"""Full pipeline from the reference firmware's wire format.

1-bit real samples at 16.368 MHz (IF 4.092 MHz), packed into the SPI
uint16 LSB-first words the MAX2769 front-end produces
(signal_capture.c:143-177) → native/NumPy unpack → mix+decimate
conditioner → acquisition → tracking → bit sync → subframe decode.
This is the path a recorded firmware capture takes through the
framework.
"""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import (
    REFERENCE_PLAN,
    ReceiverConfig,
    TrackConfig,
)
from stm32f4_sdr_gps_tpu.runtime import native
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.capture import (
    pack_bits_lsb16,
    reference_to_baseband,
)
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture

from tests.test_nav import TEST_EPH

CIB = 3


def test_wire_format_to_subframes():
    prefix = np.tile([0, 1], 50).astype(np.int8)
    body = build_bitstream(dict(TEST_EPH), start_tow_6s=700,
                           num_subframes=2, subframe_ids=(5, 1))
    sat = SimSat(prn=19, doppler_hz=2500.0, cn0_dbhz=52.0,
                 nav_bits=np.concatenate([prefix, body]),
                 codes_in_bit=CIB, delay_ms=4.321)
    epochs_ms = 2300
    x, _ = simulate_capture([sat], num_epochs=epochs_ms,
                            plan=REFERENCE_PLAN, seed=17)
    assert set(np.unique(x)) <= {-1.0, 1.0}

    # wire: pack to SPI words, unpack via the native library when built
    words = pack_bits_lsb16(x)
    lib = native.get_lib()
    signs = native.unpack_bits16(words)
    assert np.array_equal(signs, x.astype(np.float32))

    baseband = reference_to_baseband(signs)
    assert len(baseband) == len(x) // 8

    cfg = ReceiverConfig(
        prns=(19,),
        track=TrackConfig(codes_in_bit=CIB,
                          pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=250,
    )
    rx = Receiver(cfg)
    report = rx.run(baseband)
    ch = report.channels[0]
    assert ch.state_name == "TRACKING"
    assert abs(ch.doppler_hz - 2500.0) < 15.0
    assert ch.bit_count > 400
    assert ch.subframe_count >= 1, (
        ch.framer.words_decoded, ch.framer.polarity_found
    )
    # decoded ephemeris fields must match the encoded stream
    if ch.eph.received_mask_proc & 0x1:
        assert ch.eph.week == TEST_EPH["week"]
