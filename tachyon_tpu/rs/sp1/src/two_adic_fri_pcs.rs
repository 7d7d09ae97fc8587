//! TwoAdicFRI PCS over the tachyon_tpu C ABI.
//!
//! Reference counterpart: `vendors/sp1/src/two_adic_fri_pcs.rs:26-105`
//! (commit / get_evaluations_on_domain / open routed over FFI) and
//! `src/baby_bear_poseidon2.rs:28-150` (the SP1 config swap).  The
//! commitment layout is bit-compatible with plonky3's
//! `TwoAdicFriPcs<BabyBear, Radix2DitParallel, FieldMerkleTreeMmcs, …>`
//! under the SP1 constants (width-16 Poseidon2, duplex rate 8) — pinned on
//! the Python side by tests/test_fri_pinned.py and the golden vectors in
//! tests/test_fri.py.

/// FRI protocol parameters (reference: sp1 `default_fri_config`).
#[derive(Clone, Copy, Debug)]
pub struct FriConfig {
    pub log_blowup: u32,
    pub num_queries: u32,
    pub proof_of_work_bits: u32,
}

impl Default for FriConfig {
    fn default() -> Self {
        // SP1's default: blowup 2, 100 queries, 16 PoW bits.
        FriConfig {
            log_blowup: 1,
            num_queries: 100,
            proof_of_work_bits: 16,
        }
    }
}

/// A row-major BabyBear matrix (values already reduced mod p).
#[derive(Clone, Debug)]
pub struct Matrix {
    pub rows: u32,
    pub cols: u32,
    pub values: Vec<u32>,
}

impl Matrix {
    pub fn new(rows: u32, cols: u32, values: Vec<u32>) -> Self {
        assert_eq!(values.len(), (rows * cols) as usize);
        Matrix { rows, cols, values }
    }
}

#[derive(Debug, Clone, PartialEq, Eq)]
pub struct PcsError {
    pub code: i32,
    pub message: String,
}

impl std::fmt::Display for PcsError {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "sp1 pcs error {}: {}", self.code, self.message)
    }
}

impl std::error::Error for PcsError {}

fn convert(e: tachyon_tpu::Error) -> PcsError {
    PcsError {
        code: e.code,
        message: e.message,
    }
}

/// Serializes matrices into the api.h u32-LE stream:
/// num_matrices, then per matrix (rows, cols, row-major values).
fn encode_matrices(mats: &[Matrix]) -> Vec<u8> {
    let mut out = Vec::new();
    out.extend_from_slice(&(mats.len() as u32).to_le_bytes());
    for m in mats {
        out.extend_from_slice(&m.rows.to_le_bytes());
        out.extend_from_slice(&m.cols.to_le_bytes());
        for v in &m.values {
            out.extend_from_slice(&v.to_le_bytes());
        }
    }
    out
}

/// The PCS SP1 swaps in (reference: `TachyonTwoAdicFriPcs`).
pub struct TwoAdicFriPcs {
    config: FriConfig,
}

impl TwoAdicFriPcs {
    pub fn new(config: FriConfig) -> Self {
        tachyon_tpu::init(None).ok();
        TwoAdicFriPcs { config }
    }

    /// Commits a round of matrices: coset-LDE batch (blowup from the
    /// config) + Poseidon2 field-merkle-tree.  Returns the 8-element
    /// commitment as 32 bytes (u32 LE each).
    pub fn commit(&self, matrices: &[Matrix]) -> Result<[u8; 32], PcsError> {
        tachyon_tpu::sp1_baby_bear_fri_commit(
            self.config.log_blowup,
            &encode_matrices(matrices),
        )
        .map_err(convert)
    }

    /// Full commit → challenger-bound open → verify roundtrip; returns the
    /// commitment.  An Err means the backend's own verifier rejected the
    /// opening proof (never expected for well-formed inputs).
    pub fn prove_verify(&self, matrices: &[Matrix]) -> Result<[u8; 32], PcsError> {
        tachyon_tpu::sp1_baby_bear_fri_prove_verify(
            self.config.log_blowup,
            self.config.num_queries,
            self.config.proof_of_work_bits,
            &encode_matrices(matrices),
        )
        .map_err(convert)
    }
}

#[cfg(test)]
mod tests {
    //! Run with `TACHYON_TPU_C_DIR=… cargo test -- --test-threads=1`.
    use super::*;

    fn test_matrices() -> Vec<Matrix> {
        // deterministic small matrices (xorshift values mod BabyBear p)
        const P: u64 = 0x78000001;
        let mut s: u64 = 0x9E3779B97F4A7C15;
        let mut next = move || {
            s ^= s << 13;
            s ^= s >> 7;
            s ^= s << 17;
            (s % P) as u32
        };
        vec![
            Matrix::new(8, 3, (0..24).map(|_| next()).collect()),
            Matrix::new(4, 2, (0..8).map(|_| next()).collect()),
        ]
    }

    #[test]
    fn commit_is_deterministic() {
        let pcs = TwoAdicFriPcs::new(FriConfig {
            log_blowup: 1,
            num_queries: 3,
            proof_of_work_bits: 2,
        });
        let c1 = pcs.commit(&test_matrices()).unwrap();
        let c2 = pcs.commit(&test_matrices()).unwrap();
        assert_eq!(c1, c2);
        assert_ne!(c1, [0u8; 32]);
    }

    #[test]
    fn prove_verify_matches_commit() {
        let pcs = TwoAdicFriPcs::new(FriConfig {
            log_blowup: 1,
            num_queries: 3,
            proof_of_work_bits: 2,
        });
        let c = pcs.commit(&test_matrices()).unwrap();
        let c2 = pcs.prove_verify(&test_matrices()).unwrap();
        assert_eq!(c, c2);
    }
}
