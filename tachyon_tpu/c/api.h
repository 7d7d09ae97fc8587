/* tachyon_tpu C ABI — the language-binding boundary.
 *
 * Analog of the reference's monomorphized C API layer
 * (reference: tachyon/c/api.h, c/math/elliptic_curves/msm/msm.h,
 * c/zk/plonk/halo2/bn254_prover.h, tachyon/c/version.h).  The reference
 * exposes its C++ template core through extern "C" handles; here the
 * compute core is the JAX/XLA TPU framework, and this layer embeds a
 * CPython runtime that drives it.  External frontends (Rust via bindgen,
 * C++, Node) link libtachyon_tpu_c.so and never see Python.
 *
 * All functions return 0 on success, negative on failure unless stated;
 * tachyon_tpu_last_error() describes the most recent failure.
 * Field elements cross the boundary as 32-byte little-endian values
 * (standard form, not Montgomery), matching the reference's default I/O
 * convention (tachyon_bn254_fq / tachyon_bn254_fr byte layout).
 */
#ifndef TACHYON_TPU_C_API_H_
#define TACHYON_TPU_C_API_H_

#include <stddef.h>
#include <stdint.h>

#if defined(__cplusplus)
extern "C" {
#endif

#define TACHYON_TPU_VERSION_MAJOR 0
#define TACHYON_TPU_VERSION_MINOR 2
#define TACHYON_TPU_VERSION_PATCH 0
#define TACHYON_TPU_VERSION                                        \
  (TACHYON_TPU_VERSION_MAJOR * 10000 + TACHYON_TPU_VERSION_MINOR * 100 + \
   TACHYON_TPU_VERSION_PATCH)

uint32_t tachyon_tpu_version(void);
const char* tachyon_tpu_version_str(void);

/* Runtime ----------------------------------------------------------------
 * platform: "tpu", "cpu", or NULL for auto.  Initializes the embedded
 * Python + JAX runtime; safe to call more than once. */
int tachyon_tpu_init(const char* platform);
void tachyon_tpu_shutdown(void);
const char* tachyon_tpu_last_error(void);

/* Frees any string returned through a char** out-param. */
void tachyon_tpu_free_string(char* s);

/* MSM --------------------------------------------------------------------
 * bases: n affine points, 64 bytes each (x||y, 32-byte LE limbs; the
 * point at infinity is encoded as x=y=0).  scalars: n 32-byte LE values.
 * out: 64-byte affine result (x=y=0 for infinity).
 * (reference: tachyon_bn254_g1_point2_msm, c/math/.../msm.h) */
int tachyon_tpu_bn254_g1_msm(const uint8_t* bases, const uint8_t* scalars,
                             size_t n, uint8_t* out64);

/* NTT --------------------------------------------------------------------
 * In-place-style radix-2 (i)FFT over BN254 Fr: n 32-byte LE scalars in,
 * same out.  n must be a power of two dividing the field's 2-adic
 * subgroup.  (reference: tachyon_bn254_univariate_evaluation_domain_fft /
 * _ifft, c/math/polynomials/univariate/bn254_univariate_evaluation_domain.h)
 */
int tachyon_tpu_bn254_fft(const uint8_t* in, size_t n, int inverse,
                          uint8_t* out);

/* Poseidon2 --------------------------------------------------------------
 * Hashes n BN254 Fr elements (32-byte LE each) with the Horizen-flavor
 * width-3 Poseidon2 sponge; writes the 32-byte LE digest.
 * (reference: c/crypto/hashes/sponge/poseidon2 surface) */
int tachyon_tpu_bn254_poseidon2_hash(const uint8_t* inputs, size_t n,
                                     uint8_t* out32);

/* Groth16 ----------------------------------------------------------------
 * Proves a circom circuit from .zkey/.wtns paths; returns snarkjs-format
 * proof.json / public.json strings (caller frees with
 * tachyon_tpu_free_string).  no_zk!=0 makes the proof deterministic
 * (r = s = 0); verify!=0 verifies before returning (failure -> error).
 * (reference: vendors/circom/prover_main.cc CreateProof flow) */
int tachyon_tpu_bn254_groth16_prove(const char* zkey_path,
                                    const char* wtns_path, int no_zk,
                                    int verify, char** proof_json_out,
                                    char** public_json_out);

#if defined(__cplusplus)
}
#endif

#endif /* TACHYON_TPU_C_API_H_ */
