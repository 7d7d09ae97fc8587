"""Dump/replay tooling for failing kernel invocations.

Analog of the reference's replay debuggers
(reference: tachyon/c/math/elliptic_curves/msm/msm_gpu_replay.cc:19-95 —
reads dumped bases/scalars and re-runs the GPU MSM;
c/zk/plonk/halo2/prover_replay.cc + TACHYON_PCS_PARAMS_LOG_PATH).

Enable dumping with TACHYON_MSM_DUMP_PATH=/some/dir; every `dump_msm`
call writes a self-contained .npz.  Replay:

    python -m tachyon_tpu.io.replay msm /some/dir/msm_000.npz
"""
from __future__ import annotations

import os
import sys

import numpy as np

_counter = [0]


def dump_msm(curve_name: str, points_x, points_y, points_inf, scalars):
    """Write one MSM invocation if TACHYON_MSM_DUMP_PATH is set."""
    path = os.environ.get("TACHYON_MSM_DUMP_PATH")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"msm_{_counter[0]:03d}.npz")
    _counter[0] += 1
    np.savez_compressed(
        fn,
        curve=np.array(curve_name),
        x=np.asarray(points_x),
        y=np.asarray(points_y),
        inf=np.asarray(points_inf),
        scalars=np.asarray(scalars),
    )
    return fn


def replay_msm(fn: str):
    import jax.numpy as jnp

    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ec import AffinePoint
    from tachyon_tpu.math.msm import msm

    data = np.load(fn)
    curve = getattr(curves, str(data["curve"]))()
    pts = AffinePoint(
        jnp.asarray(data["x"]), jnp.asarray(data["y"]), jnp.asarray(data["inf"])
    )
    acc = msm(curve, pts, jnp.asarray(data["scalars"]))
    aff = curve.to_affine(acc)
    Fq = curve.F
    print("x =", int(Fq.decode(aff.x)) if not bool(np.asarray(aff.inf)) else None)
    print("y =", int(Fq.decode(aff.y)) if not bool(np.asarray(aff.inf)) else None)


def dump_halo2(circuit_json: str):
    """Write one halo2 C-ABI prove invocation if TACHYON_HALO2_DUMP_PATH is
    set (the prover_replay / TACHYON_PCS_PARAMS_LOG_PATH analog)."""
    path = os.environ.get("TACHYON_HALO2_DUMP_PATH")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"halo2_{_counter[0]:03d}.json")
    _counter[0] += 1
    with open(fn, "w") as f:
        f.write(circuit_json)
    return fn


def replay_halo2(fn: str):
    """Re-run a dumped halo2 prove end-to-end (prove + self-verify)."""
    from tachyon_tpu.c.bridge import halo2_prove

    with open(fn) as f:
        hexproof = halo2_prove(f.read())
    print(f"proof: {len(hexproof) // 2} bytes (verified)")
    print(hexproof)


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2 or argv[0] not in ("msm", "halo2"):
        print("usage: python -m tachyon_tpu.io.replay {msm|halo2} <dump>")
        return 1
    (replay_msm if argv[0] == "msm" else replay_halo2)(argv[1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
