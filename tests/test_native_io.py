"""Native (C++) parser parity vs the pure-python oracle."""
import os

import numpy as np
import pytest

WTNS = "/root/reference/vendors/circom/circomlib/wtns/multiplier_3.wtns"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WTNS), reason="fixture unavailable"
)


def test_native_wtns_matches_python():
    from tachyon_tpu.io.native import available
    from tachyon_tpu.io.zkey import parse_wtns

    assert available(), "native parser must build (g++ present)"
    mod_n, limbs_n = parse_wtns(WTNS, native=True)
    mod_p, limbs_p = parse_wtns(WTNS, native=False)
    assert mod_n == mod_p
    assert np.array_equal(limbs_n, limbs_p)


def test_native_section_lookup():
    from tachyon_tpu.io.native import NativeFile

    f = NativeFile(WTNS)
    off, size = f.find_section(1)
    assert off and size > 0
    missing, _ = f.find_section(99)
    assert missing is None
    f.close()
