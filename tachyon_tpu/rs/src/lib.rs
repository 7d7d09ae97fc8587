//! Rust binding for the tachyon_tpu C ABI.
//!
//! Analog of the reference's `tachyon/rs` crate (reference:
//! tachyon/rs/base/bn254_msm.rs et al., which bridge halo2/SP1 Rust
//! frontends onto the C API).  The compute core is the JAX/XLA TPU
//! framework behind `libtachyon_tpu_c`; this crate exposes a safe,
//! idiomatic surface: byte layouts match `tachyon_tpu/c/api.h`
//! (32-byte little-endian standard-form field elements; affine points
//! are `x || y`, infinity encoded as `x = y = 0`).
//!
//! ```no_run
//! use tachyon_tpu::{init, msm_bn254_g1};
//! init(None).unwrap();
//! let bases = vec![[0u8; 64]; 4];
//! let scalars = vec![[0u8; 32]; 4];
//! let acc = msm_bn254_g1(&bases, &scalars).unwrap();
//! assert_eq!(acc, [0u8; 64]); // all-infinity in, infinity out
//! ```

use std::ffi::{c_char, c_int, CStr, CString};

mod ffi {
    use super::{c_char, c_int};

    extern "C" {
        pub fn tachyon_tpu_version() -> u32;
        pub fn tachyon_tpu_version_str() -> *const c_char;
        pub fn tachyon_tpu_init(platform: *const c_char) -> c_int;
        pub fn tachyon_tpu_shutdown();
        pub fn tachyon_tpu_last_error() -> *const c_char;
        pub fn tachyon_tpu_free_string(s: *mut c_char);
        pub fn tachyon_tpu_bn254_g1_msm(
            bases: *const u8,
            scalars: *const u8,
            n: usize,
            out64: *mut u8,
        ) -> c_int;
        pub fn tachyon_tpu_bn254_fft(
            input: *const u8,
            n: usize,
            inverse: c_int,
            out: *mut u8,
        ) -> c_int;
        pub fn tachyon_tpu_bn254_poseidon2_hash(
            inputs: *const u8,
            n: usize,
            out32: *mut u8,
        ) -> c_int;
        pub fn tachyon_tpu_bn254_groth16_prove(
            zkey_path: *const c_char,
            wtns_path: *const c_char,
            no_zk: c_int,
            verify: c_int,
            proof_json_out: *mut *mut c_char,
            public_json_out: *mut *mut c_char,
        ) -> c_int;
        pub fn tachyon_tpu_halo2_bn254_prove(
            circuit_json: *const c_char,
            proof_hex_out: *mut *mut c_char,
        ) -> c_int;
        pub fn tachyon_tpu_sp1_baby_bear_fri_prove_verify(
            log_blowup: u32,
            num_queries: u32,
            pow_bits: u32,
            matrices: *const u8,
            matrices_len: usize,
            out32: *mut u8,
        ) -> c_int;
        pub fn tachyon_tpu_sp1_baby_bear_fri_commit(
            log_blowup: u32,
            matrices: *const u8,
            matrices_len: usize,
            out32: *mut u8,
        ) -> c_int;
    }
}

/// An error reported through `tachyon_tpu_last_error`.
#[derive(Debug, Clone, PartialEq, Eq)]
pub struct Error {
    pub code: i32,
    pub message: String,
}

impl std::fmt::Display for Error {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "tachyon_tpu error {}: {}", self.code, self.message)
    }
}

impl std::error::Error for Error {}

pub type Result<T> = std::result::Result<T, Error>;

fn last_error(code: c_int) -> Error {
    let message = unsafe {
        let p = ffi::tachyon_tpu_last_error();
        if p.is_null() {
            String::new()
        } else {
            CStr::from_ptr(p).to_string_lossy().into_owned()
        }
    };
    Error { code, message }
}

fn check(code: c_int) -> Result<()> {
    if code == 0 {
        Ok(())
    } else {
        Err(last_error(code))
    }
}

/// Takes ownership of a `char*` the library allocated and frees it.
fn take_string(p: *mut c_char) -> String {
    if p.is_null() {
        return String::new();
    }
    let s = unsafe { CStr::from_ptr(p).to_string_lossy().into_owned() };
    unsafe { ffi::tachyon_tpu_free_string(p) };
    s
}

/// Packed ABI version (major*10000 + minor*100 + patch).
pub fn version() -> u32 {
    unsafe { ffi::tachyon_tpu_version() }
}

/// Human-readable version string.
pub fn version_str() -> String {
    unsafe { CStr::from_ptr(ffi::tachyon_tpu_version_str()) }
        .to_string_lossy()
        .into_owned()
}

/// Initializes the embedded runtime. `platform` is `"tpu"`, `"cpu"`, or
/// `None` for auto-detection.  Idempotent.
pub fn init(platform: Option<&str>) -> Result<()> {
    let c = platform.map(|p| CString::new(p).expect("platform contains NUL"));
    let ptr = c.as_ref().map_or(std::ptr::null(), |c| c.as_ptr());
    check(unsafe { ffi::tachyon_tpu_init(ptr) })
}

/// Tears down the embedded runtime.
pub fn shutdown() {
    unsafe { ffi::tachyon_tpu_shutdown() }
}

/// BN254 G1 variable-base MSM: `sum_i scalars[i] * bases[i]`.
/// Returns the 64-byte affine accumulator (reference:
/// tachyon_bn254_g1_point2_msm).
pub fn msm_bn254_g1(bases: &[[u8; 64]], scalars: &[[u8; 32]]) -> Result<[u8; 64]> {
    assert_eq!(bases.len(), scalars.len(), "bases/scalars length mismatch");
    let mut out = [0u8; 64];
    check(unsafe {
        ffi::tachyon_tpu_bn254_g1_msm(
            bases.as_ptr().cast(),
            scalars.as_ptr().cast(),
            bases.len(),
            out.as_mut_ptr(),
        )
    })?;
    Ok(out)
}

/// BN254 Fr radix-2 (i)FFT over `n = coeffs.len()` elements (power of two).
/// (reference: tachyon_bn254_univariate_evaluation_domain_fft / _ifft)
pub fn fft_bn254_fr(coeffs: &[[u8; 32]], inverse: bool) -> Result<Vec<[u8; 32]>> {
    let mut out = vec![[0u8; 32]; coeffs.len()];
    check(unsafe {
        ffi::tachyon_tpu_bn254_fft(
            coeffs.as_ptr().cast(),
            coeffs.len(),
            inverse as c_int,
            out.as_mut_ptr().cast(),
        )
    })?;
    Ok(out)
}

/// Poseidon2 (Horizen flavor, width 3) hash of BN254 Fr elements.
pub fn poseidon2_bn254_hash(inputs: &[[u8; 32]]) -> Result<[u8; 32]> {
    let mut out = [0u8; 32];
    check(unsafe {
        ffi::tachyon_tpu_bn254_poseidon2_hash(
            inputs.as_ptr().cast(),
            inputs.len(),
            out.as_mut_ptr(),
        )
    })?;
    Ok(out)
}

/// Groth16 proof for a circom circuit; returns snarkjs-format
/// `(proof_json, public_json)` (reference: vendors/circom/prover_main.cc).
pub fn groth16_bn254_prove(
    zkey_path: &str,
    wtns_path: &str,
    no_zk: bool,
    verify: bool,
) -> Result<(String, String)> {
    let zkey = CString::new(zkey_path).expect("zkey_path contains NUL");
    let wtns = CString::new(wtns_path).expect("wtns_path contains NUL");
    let mut proof: *mut c_char = std::ptr::null_mut();
    let mut public: *mut c_char = std::ptr::null_mut();
    check(unsafe {
        ffi::tachyon_tpu_bn254_groth16_prove(
            zkey.as_ptr(),
            wtns.as_ptr(),
            no_zk as c_int,
            verify as c_int,
            &mut proof,
            &mut public,
        )
    })?;
    Ok((take_string(proof), take_string(public)))
}

/// Halo2 (bn254, Scroll vendor) proof over a JSON circuit description;
/// returns the proof hex (see api.h for the schema; reference:
/// tachyon_halo2_bn254_prover_create_proof).
pub fn halo2_bn254_prove(circuit_json: &str) -> Result<String> {
    let json = CString::new(circuit_json).expect("circuit_json contains NUL");
    let mut proof: *mut c_char = std::ptr::null_mut();
    check(unsafe { ffi::tachyon_tpu_halo2_bn254_prove(json.as_ptr(), &mut proof) })?;
    Ok(take_string(proof))
}

/// SP1-style BabyBear Poseidon2 TwoAdicFRI commit→open→verify roundtrip.
/// `matrices` is the u32-LE stream described in api.h; returns the tallest
/// tree's 8-element Poseidon2 commitment (32 bytes).
pub fn sp1_baby_bear_fri_prove_verify(
    log_blowup: u32,
    num_queries: u32,
    pow_bits: u32,
    matrices: &[u8],
) -> Result<[u8; 32]> {
    let mut out = [0u8; 32];
    check(unsafe {
        ffi::tachyon_tpu_sp1_baby_bear_fri_prove_verify(
            log_blowup,
            num_queries,
            pow_bits,
            matrices.as_ptr(),
            matrices.len(),
            out.as_mut_ptr(),
        )
    })?;
    Ok(out)
}

/// Commit-only half of the SP1 PCS swap: BabyBear coset-LDE batch +
/// Poseidon2 field-merkle-tree MMCS root (32 bytes, 8 u32 LE).
pub fn sp1_baby_bear_fri_commit(
    log_blowup: u32,
    matrices: &[u8],
) -> Result<[u8; 32]> {
    let mut out = [0u8; 32];
    check(unsafe {
        ffi::tachyon_tpu_sp1_baby_bear_fri_commit(
            log_blowup,
            matrices.as_ptr(),
            matrices.len(),
            out.as_mut_ptr(),
        )
    })?;
    Ok(out)
}

#[cfg(test)]
mod tests {
    //! Needs libtachyon_tpu_c.so on the linker path; run with
    //! `TACHYON_TPU_C_DIR=… LD_LIBRARY_PATH=… cargo test -- --test-threads=1`
    //! (one embedded runtime per process).
    use super::*;

    #[test]
    fn version_matches_header() {
        assert_eq!(version(), 200);
        assert!(version_str().starts_with("0.2."));
    }

    #[test]
    fn msm_all_infinity() {
        init(Some("cpu")).unwrap();
        let bases = vec![[0u8; 64]; 8];
        let scalars = vec![[0u8; 32]; 8];
        assert_eq!(msm_bn254_g1(&bases, &scalars).unwrap(), [0u8; 64]);
    }

    #[test]
    fn fft_roundtrip() {
        init(Some("cpu")).unwrap();
        let mut coeffs = vec![[0u8; 32]; 4];
        for (i, c) in coeffs.iter_mut().enumerate() {
            c[0] = i as u8 + 1;
        }
        let evals = fft_bn254_fr(&coeffs, false).unwrap();
        let back = fft_bn254_fr(&evals, true).unwrap();
        assert_eq!(back, coeffs);
    }
}
