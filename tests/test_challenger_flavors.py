"""MultiField32 / Hash challenger golden tests against the reference
unittest vectors (crypto/challenger/multi_field32_challenger_unittest.cc:50-65,
hash_challenger_unittest.cc:50-62)."""
from tachyon_tpu.crypto import poseidon2
from tachyon_tpu.crypto.challenger import HashChallenger, MultiField32Challenger
from tachyon_tpu.fields import presets


def test_multi_field32_challenger_golden():
    ch = MultiField32Challenger(poseidon2.bn254_w3(), presets.BABY_BEAR.p)
    for i in range(20):
        ch.observe(i)
    answers = [
        72199253, 733473132, 442816494, 326641700, 1342573676, 1242755868,
        887300172, 1831922292, 1518709680,
    ]
    for a in answers:
        assert ch.sample() == a


def test_multi_field32_grind():
    ch = MultiField32Challenger(poseidon2.bn254_w3(), presets.BABY_BEAR.p)
    bits = 3
    for w in range(100):
        clone = MultiField32Challenger(poseidon2.bn254_w3(), presets.BABY_BEAR.p)
        clone._state = list(ch._state)
        clone._inputs = list(ch._inputs)
        clone._outputs = list(ch._outputs)
        if clone.check_witness(bits, w):
            assert ch.check_witness(bits, w)
            return
    raise AssertionError("no witness found")


def test_hash_challenger_golden():
    ch = HashChallenger(poseidon2.baby_bear_p3_w16(), out_len=8, rate=8)
    ch._inputs = [i + 1 for i in range(10)]
    for i in range(20):
        ch.observe(i)
    answers = [
        886174168, 1457271233, 1952268252, 1595005924, 796215768,
        1553987485, 1108393593, 1336137665, 971109448, 1853357459,
    ]
    for a in answers:
        assert ch.sample() == a
