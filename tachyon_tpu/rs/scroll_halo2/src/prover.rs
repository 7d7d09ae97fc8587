//! Proof driver: the analog of the reference's
//! `vendors/scroll_halo2/src/prover.rs:36` `create_proof`, routed through
//! the tachyon_tpu C ABI instead of per-commit cxx calls.  The backend
//! verifies the proof before returning, mirroring the reference's unittest
//! convention (prove → verify in one round trip).

use crate::circuit::CircuitBuilder;

/// Error from the backend (code + `tachyon_tpu_last_error` message).
#[derive(Debug, Clone, PartialEq, Eq)]
pub struct ProverError {
    pub code: i32,
    pub message: String,
}

impl std::fmt::Display for ProverError {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "halo2 prover error {}: {}", self.code, self.message)
    }
}

impl std::error::Error for ProverError {}

/// Creates (and backend-verifies) a halo2 proof for the synthesized
/// circuit; returns the raw proof bytes (Blake2b transcript encoding,
/// bit-compatible with scroll halo2 — see tests/test_halo2_golden.py for
/// the byte-level pins against the reference's *_test_data.h).
pub fn create_proof(circuit: &CircuitBuilder) -> Result<Vec<u8>, ProverError> {
    tachyon_tpu::init(None).map_err(|e| ProverError {
        code: e.code,
        message: e.message,
    })?;
    let hex = tachyon_tpu::halo2_bn254_prove(&circuit.to_json()).map_err(
        |e| ProverError {
            code: e.code,
            message: e.message,
        },
    )?;
    let hex = hex.trim();
    let mut out = Vec::with_capacity(hex.len() / 2);
    let bytes = hex.as_bytes();
    for pair in bytes.chunks(2) {
        let hi = (pair[0] as char).to_digit(16).ok_or_else(|| ProverError {
            code: -1,
            message: "non-hex proof output".into(),
        })?;
        let lo = (*pair.get(1).unwrap_or(&b'0') as char)
            .to_digit(16)
            .ok_or_else(|| ProverError {
                code: -1,
                message: "non-hex proof output".into(),
            })?;
        out.push(((hi << 4) | lo) as u8);
    }
    Ok(out)
}

#[cfg(test)]
mod tests {
    //! Run with the shared library on the path:
    //! `TACHYON_TPU_C_DIR=… cargo test -- --test-threads=1`
    use super::*;
    use crate::circuit::{ColumnKind, Expr, Pcs};

    /// The mul circuit of examples/halo2_mul_circuit.json: one gate
    /// s * (a0 * a1 - a0[+1]), one copy to the instance column.
    fn mul_circuit(pcs: Pcs) -> CircuitBuilder {
        let mut c = CircuitBuilder::new(4, pcs);
        let a0 = c.advice_column();
        let a1 = c.advice_column();
        let i0 = c.instance_column();
        c.enable_equality(ColumnKind::Advice, a0);
        c.enable_equality(ColumnKind::Instance, i0);
        let s = c.simple_selector();
        c.gate(vec![Expr::selector(s).prod(
            Expr::advice(a0 as usize, 0)
                .prod(Expr::advice(a1 as usize, 0))
                .sum(Expr::advice(a0 as usize, 1).neg()),
        )]);
        c.assign_advice(a0, 0, 3);
        c.assign_advice(a1, 0, 4);
        c.assign_advice(a0, 1, 12);
        c.enable_selector(s, 0);
        c.copy(
            (ColumnKind::Advice, a0, 1),
            (ColumnKind::Instance, i0, 0),
        );
        c.set_instance(i0, 0, 12);
        c
    }

    #[test]
    fn mul_circuit_proves_shplonk() {
        let proof = create_proof(&mul_circuit(Pcs::Shplonk)).unwrap();
        assert!(!proof.is_empty());
    }

    #[test]
    fn mul_circuit_proves_gwc() {
        let proof = create_proof(&mul_circuit(Pcs::Gwc)).unwrap();
        assert!(!proof.is_empty());
    }
}
