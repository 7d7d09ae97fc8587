/* Node.js N-API binding for the tachyon_tpu C ABI.
 *
 * Analog of the reference's node binding (reference: tachyon/node/ —
 * node-addon-api class framework over the C API).  The surface here is
 * functional: Buffers in, Buffers/strings out, byte layouts as documented
 * in tachyon_tpu/c/api.h (32-byte LE standard-form field elements; affine
 * points are x||y with infinity encoded as zeros).
 *
 * Build with node-gyp (see binding.gyp); requires libtachyon_tpu_c.so
 * built by `make -C tachyon_tpu/c`.
 */
#include <node_api.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "api.h"

#define NAPI_CALL(env, call)                              \
  do {                                                    \
    if ((call) != napi_ok) {                              \
      napi_throw_error((env), NULL, "N-API call failed"); \
      return NULL;                                        \
    }                                                     \
  } while (0)

static napi_value throw_last_error(napi_env env, int rc) {
  const char* msg = tachyon_tpu_last_error();
  char buf[512];
  snprintf(buf, sizeof(buf), "tachyon_tpu error %d: %s", rc,
           msg ? msg : "(no message)");
  napi_throw_error(env, NULL, buf);
  return NULL;
}

static int get_buffer(napi_env env, napi_value v, uint8_t** data,
                      size_t* len) {
  bool is_buf = false;
  if (napi_is_buffer(env, v, &is_buf) != napi_ok || !is_buf) return -1;
  return napi_get_buffer_info(env, v, (void**)data, len) == napi_ok ? 0 : -1;
}

/* init(platform?: string) */
static napi_value Init(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value args[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  char platform[16] = {0};
  const char* p = NULL;
  if (argc >= 1) {
    napi_valuetype t;
    NAPI_CALL(env, napi_typeof(env, args[0], &t));
    if (t == napi_string) {
      size_t n;
      NAPI_CALL(env, napi_get_value_string_utf8(env, args[0], platform,
                                                sizeof(platform), &n));
      p = platform;
    }
  }
  int rc = tachyon_tpu_init(p);
  if (rc != 0) return throw_last_error(env, rc);
  napi_value undef;
  NAPI_CALL(env, napi_get_undefined(env, &undef));
  return undef;
}

/* version(): number */
static napi_value Version(napi_env env, napi_callback_info info) {
  napi_value out;
  NAPI_CALL(env, napi_create_uint32(env, tachyon_tpu_version(), &out));
  return out;
}

/* versionStr(): string */
static napi_value VersionStr(napi_env env, napi_callback_info info) {
  napi_value out;
  NAPI_CALL(env, napi_create_string_utf8(env, tachyon_tpu_version_str(),
                                         NAPI_AUTO_LENGTH, &out));
  return out;
}

/* msmBn254G1(bases: Buffer(64n), scalars: Buffer(32n)): Buffer(64) */
static napi_value MsmBn254G1(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value args[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  uint8_t *bases, *scalars;
  size_t blen, slen;
  if (argc < 2 || get_buffer(env, args[0], &bases, &blen) ||
      get_buffer(env, args[1], &scalars, &slen)) {
    napi_throw_type_error(env, NULL, "expected (basesBuffer, scalarsBuffer)");
    return NULL;
  }
  if (blen % 64 || slen % 32 || blen / 64 != slen / 32) {
    napi_throw_range_error(env, NULL, "bases 64B/point, scalars 32B/scalar");
    return NULL;
  }
  napi_value out;
  uint8_t* out_data;
  NAPI_CALL(env, napi_create_buffer(env, 64, (void**)&out_data, &out));
  int rc = tachyon_tpu_bn254_g1_msm(bases, scalars, blen / 64, out_data);
  if (rc != 0) return throw_last_error(env, rc);
  return out;
}

/* fftBn254Fr(coeffs: Buffer(32n), inverse: boolean): Buffer(32n) */
static napi_value FftBn254Fr(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value args[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  uint8_t* in;
  size_t len;
  bool inverse = false;
  if (argc < 1 || get_buffer(env, args[0], &in, &len) || len % 32) {
    napi_throw_type_error(env, NULL, "expected (coeffsBuffer, inverse?)");
    return NULL;
  }
  if (argc >= 2) NAPI_CALL(env, napi_get_value_bool(env, args[1], &inverse));
  napi_value out;
  uint8_t* out_data;
  NAPI_CALL(env, napi_create_buffer(env, len, (void**)&out_data, &out));
  int rc = tachyon_tpu_bn254_fft(in, len / 32, inverse ? 1 : 0, out_data);
  if (rc != 0) return throw_last_error(env, rc);
  return out;
}

/* poseidon2Bn254Hash(inputs: Buffer(32n)): Buffer(32) */
static napi_value Poseidon2Bn254Hash(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value args[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  uint8_t* in;
  size_t len;
  if (argc < 1 || get_buffer(env, args[0], &in, &len) || len % 32) {
    napi_throw_type_error(env, NULL, "expected (inputsBuffer of 32B elems)");
    return NULL;
  }
  napi_value out;
  uint8_t* out_data;
  NAPI_CALL(env, napi_create_buffer(env, 32, (void**)&out_data, &out));
  int rc = tachyon_tpu_bn254_poseidon2_hash(in, len / 32, out_data);
  if (rc != 0) return throw_last_error(env, rc);
  return out;
}

/* groth16Bn254Prove(zkeyPath, wtnsPath, opts?: {noZk, verify})
 *   -> { proof: string, public: string }  (snarkjs JSON strings) */
static napi_value Groth16Bn254Prove(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value args[3];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  char zkey[4096], wtns[4096];
  size_t n;
  if (argc < 2 ||
      napi_get_value_string_utf8(env, args[0], zkey, sizeof(zkey), &n) !=
          napi_ok ||
      napi_get_value_string_utf8(env, args[1], wtns, sizeof(wtns), &n) !=
          napi_ok) {
    napi_throw_type_error(env, NULL, "expected (zkeyPath, wtnsPath, opts?)");
    return NULL;
  }
  bool no_zk = false, verify = true;
  if (argc >= 3) {
    napi_value v;
    bool has;
    if (napi_get_named_property(env, args[2], "noZk", &v) == napi_ok)
      napi_get_value_bool(env, v, &no_zk);
    if (napi_has_named_property(env, args[2], "verify", &has) == napi_ok &&
        has && napi_get_named_property(env, args[2], "verify", &v) == napi_ok)
      napi_get_value_bool(env, v, &verify);
  }
  char *proof_json = NULL, *public_json = NULL;
  int rc = tachyon_tpu_bn254_groth16_prove(zkey, wtns, no_zk ? 1 : 0,
                                           verify ? 1 : 0, &proof_json,
                                           &public_json);
  if (rc != 0) return throw_last_error(env, rc);
  napi_value out, vproof, vpublic;
  NAPI_CALL(env, napi_create_object(env, &out));
  NAPI_CALL(env, napi_create_string_utf8(env, proof_json, NAPI_AUTO_LENGTH,
                                         &vproof));
  NAPI_CALL(env, napi_create_string_utf8(env, public_json, NAPI_AUTO_LENGTH,
                                         &vpublic));
  tachyon_tpu_free_string(proof_json);
  tachyon_tpu_free_string(public_json);
  NAPI_CALL(env, napi_set_named_property(env, out, "proof", vproof));
  NAPI_CALL(env, napi_set_named_property(env, out, "public", vpublic));
  return out;
}

/* halo2Bn254Prove(circuitJson: string): string (proof hex) */
static napi_value Halo2Bn254Prove(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value args[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  size_t len = 0;
  if (argc < 1 ||
      napi_get_value_string_utf8(env, args[0], NULL, 0, &len) != napi_ok) {
    napi_throw_type_error(env, NULL, "expected (circuitJson)");
    return NULL;
  }
  char* json = malloc(len + 1);
  if (!json) {
    napi_throw_error(env, NULL, "out of memory");
    return NULL;
  }
  if (napi_get_value_string_utf8(env, args[0], json, len + 1, &len) !=
      napi_ok) {
    free(json);
    napi_throw_type_error(env, NULL, "expected (circuitJson)");
    return NULL;
  }
  char* proof_hex = NULL;
  int rc = tachyon_tpu_halo2_bn254_prove(json, &proof_hex);
  free(json);
  if (rc != 0) return throw_last_error(env, rc);
  napi_value out;
  napi_status st =
      napi_create_string_utf8(env, proof_hex, NAPI_AUTO_LENGTH, &out);
  tachyon_tpu_free_string(proof_hex);
  if (st != napi_ok) {
    napi_throw_error(env, NULL, "N-API call failed");
    return NULL;
  }
  return out;
}

/* sp1BabyBearFriProveVerify(logBlowup, numQueries, powBits,
 *                           matrices: Buffer): Buffer(32) */
static napi_value Sp1BabyBearFri(napi_env env, napi_callback_info info) {
  size_t argc = 4;
  napi_value args[4];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  uint32_t log_blowup, num_queries, pow_bits;
  uint8_t* matrices;
  size_t mlen;
  if (argc < 4 ||
      napi_get_value_uint32(env, args[0], &log_blowup) != napi_ok ||
      napi_get_value_uint32(env, args[1], &num_queries) != napi_ok ||
      napi_get_value_uint32(env, args[2], &pow_bits) != napi_ok ||
      get_buffer(env, args[3], &matrices, &mlen)) {
    napi_throw_type_error(
        env, NULL, "expected (logBlowup, numQueries, powBits, matricesBuf)");
    return NULL;
  }
  napi_value out;
  uint8_t* out_data;
  NAPI_CALL(env, napi_create_buffer(env, 32, (void**)&out_data, &out));
  int rc = tachyon_tpu_sp1_baby_bear_fri_prove_verify(
      log_blowup, num_queries, pow_bits, matrices, mlen, out_data);
  if (rc != 0) return throw_last_error(env, rc);
  return out;
}

/* sp1BabyBearFriCommit(logBlowup, matrices: Buffer): Buffer(32) */
static napi_value Sp1BabyBearFriCommit(napi_env env,
                                       napi_callback_info info) {
  size_t argc = 2;
  napi_value args[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, NULL, NULL));
  uint32_t log_blowup;
  uint8_t* matrices;
  size_t mlen;
  if (argc < 2 ||
      napi_get_value_uint32(env, args[0], &log_blowup) != napi_ok ||
      get_buffer(env, args[1], &matrices, &mlen)) {
    napi_throw_type_error(env, NULL, "expected (logBlowup, matricesBuf)");
    return NULL;
  }
  napi_value out;
  uint8_t* out_data;
  NAPI_CALL(env, napi_create_buffer(env, 32, (void**)&out_data, &out));
  int rc = tachyon_tpu_sp1_baby_bear_fri_commit(log_blowup, matrices, mlen,
                                                out_data);
  if (rc != 0) return throw_last_error(env, rc);
  return out;
}

static napi_value ModuleInit(napi_env env, napi_value exports) {
  const napi_property_descriptor props[] = {
      {"init", NULL, Init, NULL, NULL, NULL, napi_default, NULL},
      {"version", NULL, Version, NULL, NULL, NULL, napi_default, NULL},
      {"versionStr", NULL, VersionStr, NULL, NULL, NULL, napi_default, NULL},
      {"msmBn254G1", NULL, MsmBn254G1, NULL, NULL, NULL, napi_default, NULL},
      {"fftBn254Fr", NULL, FftBn254Fr, NULL, NULL, NULL, napi_default, NULL},
      {"poseidon2Bn254Hash", NULL, Poseidon2Bn254Hash, NULL, NULL, NULL,
       napi_default, NULL},
      {"groth16Bn254Prove", NULL, Groth16Bn254Prove, NULL, NULL, NULL,
       napi_default, NULL},
      {"halo2Bn254Prove", NULL, Halo2Bn254Prove, NULL, NULL, NULL,
       napi_default, NULL},
      {"sp1BabyBearFriProveVerify", NULL, Sp1BabyBearFri, NULL, NULL, NULL,
       napi_default, NULL},
      {"sp1BabyBearFriCommit", NULL, Sp1BabyBearFriCommit, NULL, NULL, NULL,
       napi_default, NULL},
  };
  napi_define_properties(env, exports,
                         sizeof(props) / sizeof(props[0]), props);
  return exports;
}

NAPI_MODULE(NODE_GYP_MODULE_NAME, ModuleInit)
