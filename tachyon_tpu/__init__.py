"""tachyon_tpu: a TPU-native modular ZK backend (JAX/XLA/Pallas).

Re-implements the capabilities of the reference CUDA/C++ framework
("a Modular ZK Backend, powered by GPU") TPU-first: finite fields as
limb-vectorized JAX arrays, MSM/NTT/Poseidon as XLA/Pallas programs, and
multi-chip scaling via jax.sharding meshes and collectives.
"""

__version__ = "0.1.0"
