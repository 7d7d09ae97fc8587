"""Weak-scaling validation on the virtual CPU mesh (1/2/4/8 devices).

Real multi-chip hardware isn't reachable from this box, so this measures
the DECOMPOSITION, not ICI wall-clock: on a 1-core host the d virtual
devices serialize, so ideal weak scaling is wall(d) = d * wall(1) + comm.
The reported efficiency  eff = d * wall(1) / wall(d)  isolates the
sharding overhead (collective cost + partitioning) from compute; values
near 1 validate the ratios behind the >=80% 1->4-host north star
(SURVEY §2.8; the reference is single-process — pippenger_adapter.h:84-100
is its intra-node analog).

Collective volumes are computed analytically from the decomposition:
  * msm_sharded: one all_gather of a single XYZZ point per device
    (4 coords x L u32 limbs) — O(d), independent of n.
  * DistributedNTT (four-step): two all_to_alls of the full n-element
    array + twiddle-scaled local FFTs — 2 * n * L u32 per step.

Usage:  python -m benchmarks.scaling   (writes SCALING_r05.md)
"""
import os
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tachyon_tpu.base.cache import enable_persistent_cache

    enable_persistent_cache("cpu_scaling")
    import jax.numpy as jnp

    from tachyon_tpu.fields import presets
    from tachyon_tpu.math.field import PrimeField
    from tachyon_tpu.math import curves
    from tachyon_tpu.math.ec import AffinePoint
    from tachyon_tpu.math.msm import MSM_NAIVE_THRESHOLD
    from tachyon_tpu.parallel.mesh import data_mesh
    from tachyon_tpu.parallel.msm_sharded import msm_sharded
    from tachyon_tpu.parallel.ntt_dist import DistributedNTT
    from tachyon_tpu.fields.spec import int_to_limbs
    from tests.test_ec import py_mul

    rng = np.random.default_rng(11)
    curve = curves.bn254_g1()
    F = PrimeField(presets.BABY_BEAR)
    rows = {"msm": {}, "ntt": {}}

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
            best = min(best, time.time() - t0)
        return best

    # --- MSM weak scaling (off by default on the CPU mesh: the jnp EC
    # scan fallback costs ~60s per msm on one core, swamping the
    # decomposition signal; enable with SCALING_MSM=1 on real chips) ----
    per_shard = int(os.environ.get('SCALING_PER_SHARD', '64'))
    run_msm = os.environ.get('SCALING_MSM', '')
    G = (int(curve.gen_x), int(curve.gen_y))
    pool = [py_mul(G, int(k), 0, curve.F.p)
            for k in rng.integers(1, 1 << 16, 32)]
    Ls = curve.SF.spec.L
    for d in ((1, 2, 4, 8) if run_msm else ()):
        mesh = data_mesh(d, platform="cpu")
        m = d * per_shard
        pts = [pool[i % 32] for i in range(m)]
        xs = np.array([p[0] for p in pts], dtype=object)
        ys = np.array([p[1] for p in pts], dtype=object)
        points = AffinePoint(curve.F.encode(xs), curve.F.encode(ys),
                             jnp.zeros(m, bool))
        sc = jnp.asarray(np.stack(
            [int_to_limbs(int(k), Ls) for k in rng.integers(1, 1 << 30, m)],
            -1))
        rows["msm"][d] = timeit(
            lambda p, s, mesh=mesh: msm_sharded(curve, mesh, p, s, c=4),
            points, sc)
        print(f"# msm d={d} n={m}: {rows['msm'][d]:.3f}s", flush=True)

    # --- NTT weak scaling: n = d * base ----------------------------------
    base = 1 << int(os.environ.get('SCALING_NTT_LOG', '10'))
    for d in (1, 2, 4, 8):
        mesh = data_mesh(d, platform="cpu")
        n = d * base
        a = F.random((n,), rng)
        ntt = DistributedNTT(F, n, mesh)
        rows["ntt"][d] = timeit(lambda x, ntt=ntt: ntt.fft(x), a)
        print(f"# ntt d={d} n={n}: {rows['ntt'][d]:.3f}s", flush=True)

    L_fq = curve.F.spec.L
    lines = [
        "# Multi-chip weak scaling (8-device virtual CPU mesh, round 5)",
        "",
        "Virtual devices serialize on this 1-core host, so ideal weak",
        "scaling is wall(d) = d x wall(1); eff = d*wall(1)/wall(d) isolates",
        "the sharding overhead (see benchmarks/scaling.py docstring).",
        "",
        "| kernel | d | n | wall (s) | eff vs d x wall(1) | analytic collective volume |",
        "|---|---|---|---|---|---|",
    ]
    for d in ((1, 2, 4, 8) if run_msm else ()):
        t = rows["msm"][d]
        eff = d * rows["msm"][1] / t
        vol = d * 4 * L_fq * 4  # d partials x XYZZ(4 coords) x L u32
        lines.append(
            f"| msm_sharded (BN254, {per_shard}/shard) | {d} | "
            f"{d*per_shard} | {t:.3f} | {eff:.2f} | {vol} B all_gather |")
    for d in (1, 2, 4, 8):
        t = rows["ntt"][d]
        eff = d * rows["ntt"][1] / t
        vol = 2 * d * base * 4  # two all_to_alls of n u32 values
        lines.append(
            f"| DistributedNTT (BabyBear, {base}/shard) | {d} | {d*base} | "
            f"{t:.3f} | {eff:.2f} | {vol} B all_to_all |")
    out = "\n".join(lines) + "\n"
    with open("/root/repo/SCALING_r05.md", "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
