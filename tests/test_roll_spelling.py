"""Source contract: no negative dynamic pltpu.roll amounts in kernels.

On real TPU hardware (v5e via the axon relay toolchain),
``tpu.dynamic_rotate`` with a negative amount returns garbage lanes at
non-power-of-two plane widths (4352/2176) while interpret mode is
exact — CPU tests CANNOT catch a regression, so this test enforces the
safe spelling statically: every dynamic ``pltpu.roll`` amount must be
non-negative (fold a left-roll by ``s`` into ``width - s`` in
[0, width)).  Hardware evidence: tools/tpu_roll_wide_probe.py; the
whole-kernel symptom it caused (30 dB prompt-power loss) is recorded
in docs/SCALING.md "Mosaic divergence — ROOT-CAUSED AND FIXED".
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "stm32f4_sdr_gps_tpu"

# a roll whose amount expression starts with a unary minus — the
# spelling that is exact in interpret mode but wrong on hardware
_NEG_AMOUNT = re.compile(r"pltpu\.roll\(\s*[^,]+,\s*-")


def test_no_negative_dynamic_roll_amounts():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            if _NEG_AMOUNT.search(line):
                offenders.append(f"{path.name}:{lineno}: {line.strip()}")
    assert not offenders, (
        "negative dynamic pltpu.roll amount(s) — garbage on real TPU "
        "hardware at non-power-of-two widths (see "
        "tools/tpu_roll_wide_probe.py):\n" + "\n".join(offenders))
