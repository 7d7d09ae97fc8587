//! SP1 vendor frontend: the BabyBear Poseidon2 TwoAdicFRI PCS swap.
//!
//! Mirrors the role of the reference's `vendors/sp1/src/two_adic_fri_pcs.rs`
//! (the `Pcs` implementation SP1 plugs in so trace commits and FRI opening
//! proofs run on the tachyon backend): matrices are serialized into the
//! u32-LE stream of tachyon_tpu/c/api.h and the commit / open+verify paths
//! execute behind the C ABI, where the coset-LDE batch, the Poseidon2
//! field-merkle-tree MMCS, the FRI fold schedule, and the grinding PoW all
//! run as JAX/XLA TPU graphs.

pub mod two_adic_fri_pcs;

pub use two_adic_fri_pcs::{FriConfig, Matrix, PcsError, TwoAdicFriPcs};
