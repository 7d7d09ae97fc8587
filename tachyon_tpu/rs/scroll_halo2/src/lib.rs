//! Scroll-halo2 vendor frontend for the tachyon_tpu backend.
//!
//! Mirrors the role of the reference's `vendors/scroll_halo2/src/prover.rs`
//! `create_proof` (a halo2 prover whose commitments/FFTs run on the tachyon
//! backend over FFI): circuits are described and synthesized on the Rust
//! side, then the whole bit-compatible proving pipeline — keygen, selector
//! compression, permutation/lookup/shuffle arguments, vanishing argument,
//! SHPlonk or GWC multiopen, Blake2b transcript — executes behind the
//! `tachyon_tpu_halo2_bn254_prove` C ABI entry (tachyon_tpu/c/api.h).
//!
//! The boundary is coarser than the reference's (one call per proof instead
//! of per-commit FFI), which suits the TPU execution model: the backend jit
//! compiles the full pipeline once and keeps every hot loop on device.

pub mod circuit;
pub mod prover;

pub use circuit::{CircuitBuilder, ColumnKind, Expr, LookupSpec, Pcs, ShuffleSpec};
pub use prover::{create_proof, ProverError};
