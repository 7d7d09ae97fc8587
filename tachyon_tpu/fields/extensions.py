"""Small-field extension instances (FRI challenge fields).

Reference parameter sources:
  * BabyBear4 (x^4 - 11):  math/finite_fields/baby_bear/internal/BUILD.bazel:17
  * KoalaBear4 (x^4 - 3):  math/finite_fields/koala_bear/internal/BUILD.bazel:17
  * Goldilocks2 (x^2 - 7): math/finite_fields/goldilocks/internal/BUILD.bazel:36
"""
import functools

from tachyon_tpu.fields import presets
from tachyon_tpu.math.field import PrimeField
from tachyon_tpu.math.extfield import ExtField


@functools.lru_cache(maxsize=None)
def baby_bear4() -> ExtField:
    return ExtField(PrimeField(presets.BABY_BEAR), 4, 11, name="baby_bear4")


@functools.lru_cache(maxsize=None)
def koala_bear4() -> ExtField:
    return ExtField(PrimeField(presets.KOALA_BEAR), 4, 3, name="koala_bear4")


@functools.lru_cache(maxsize=None)
def goldilocks2() -> ExtField:
    return ExtField(PrimeField(presets.GOLDILOCKS), 2, 7, name="goldilocks2")
