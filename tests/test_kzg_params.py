"""Production SRS path: halo2 params wire format round-trip
(reference: c/zk/plonk/halo2/buffer_reader.h:488-523 — u32 k, G1 powers,
G1 lagrange, g2, s_g2, coordinates as 4x u64 LE Montgomery limbs)."""
import numpy as np

from tachyon_tpu.crypto import kzg
from tachyon_tpu.math import curves
from tachyon_tpu.ops import mont


def test_params_roundtrip_and_commit():
    Fr = curves.bn254_fr()
    Fq = curves.bn254_g1().F
    params = kzg.unsafe_setup(8, tau=7)
    blob = kzg.dump_params(params)
    # layout: 4 + 2*8*64 + 2*128
    assert len(blob) == 4 + 2 * 8 * 64 + 2 * 128
    loaded = kzg.load_params(blob)
    assert loaded.n == 8
    for a, b in ((params.g1_powers, loaded.g1_powers),
                 (params.g1_lagrange, loaded.g1_lagrange)):
        assert np.array_equal(np.asarray(Fq.decode(a.x)),
                              np.asarray(Fq.decode(b.x)))
        assert np.array_equal(np.asarray(Fq.decode(a.y)),
                              np.asarray(Fq.decode(b.y)))
        assert np.array_equal(np.asarray(a.inf), np.asarray(b.inf))
    assert params.g2_gen == loaded.g2_gen
    assert params.g2_tau == loaded.g2_tau

    # commitments through the loaded SRS match the generated one
    rng = np.random.default_rng(3)
    coeffs = Fr.encode(np.array(
        [int(v) % Fr.p for v in rng.integers(1, 1 << 62, 8)], dtype=object))
    std = mont.mont_reduce(Fr.spec, coeffs)
    c1 = kzg.to_int_point(kzg.commit(params, std))
    c2 = kzg.to_int_point(kzg.commit(loaded, std))
    assert c1 == c2


def test_first_power_is_generator():
    """tau^0 * G = G must survive the wire format (Montgomery conversion)."""
    params = kzg.unsafe_setup(4, tau=5)
    loaded = kzg.load_params(kzg.dump_params(params))
    Fq = curves.bn254_g1().F
    assert int(np.asarray(Fq.decode(loaded.g1_powers.x))[0]) == 1
    assert int(np.asarray(Fq.decode(loaded.g1_powers.y))[0]) == 2
