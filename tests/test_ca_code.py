"""C/A code generator tests against two independent oracles."""

import numpy as np

from stm32f4_sdr_gps_tpu.config import CODE_LENGTH
from stm32f4_sdr_gps_tpu.signal.ca_code import (
    G2_DELAY_CHIPS,
    _g1_g2_sequences,
    ca_code_bipolar,
    ca_code_bits,
    ca_table_bipolar,
    first_chips_octal,
    sample_code,
)

# IS-GPS-200 table 3-Ia: first 10 chips (octal) for a sample of PRNs.
FIRST_10_OCTAL = {1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133}


def test_first_chips_match_spec():
    for prn, expect in FIRST_10_OCTAL.items():
        assert first_chips_octal(prn) == expect


def test_matches_g2_delay_oracle():
    """The firmware generates via the G2 delay table
    (gps_misc.c:319-341); phase-select taps must agree for all PRNs."""
    g1, g2_stages = _g1_g2_sequences()
    g2 = g2_stages[:, 9]
    for prn in range(1, 33):
        ref = g1 ^ np.roll(g2, G2_DELAY_CHIPS[prn - 1])
        assert np.array_equal(ref, ca_code_bits(prn)), prn


def test_balance_and_autocorrelation():
    for prn in (1, 7, 22, 32):
        c = ca_code_bipolar(prn, np.int32)
        assert c.sum() == -1  # 512 ones vs 511 zeros
        ac = np.array(
            [np.dot(c, np.roll(c, k)) for k in range(CODE_LENGTH)]
        )
        assert ac[0] == CODE_LENGTH
        assert np.abs(ac[1:]).max() <= 65  # three-valued Gold correlation


def test_cross_correlation_bounded():
    c1 = ca_code_bipolar(1, np.int32)
    c2 = ca_code_bipolar(2, np.int32)
    cc = np.array([np.dot(c1, np.roll(c2, k)) for k in range(0, 1023, 7)])
    assert np.abs(cc).max() <= 65


def test_sample_code_two_per_chip():
    bits = ca_code_bits(3)
    s = sample_code(bits, 0.0, 2.0, 2046)
    assert np.array_equal(s[0::2], bits)
    assert np.array_equal(s[1::2], bits)
    # fractional phase shifts the chip boundary
    s2 = sample_code(bits, 0.5, 2.0, 4)
    assert np.array_equal(s2, [bits[0], bits[1], bits[1], bits[2]])


def test_table_shape():
    t = ca_table_bipolar((1, 2, 3))
    assert t.shape == (3, CODE_LENGTH)
    assert set(np.unique(t)) == {-1.0, 1.0}
