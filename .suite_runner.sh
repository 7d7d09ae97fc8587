#!/bin/bash
# Sequential CPU suite runner — ONE jax process at a time (box constraint).
# Appends per-file results to SUITE_CPU_r02b.txt, full logs in .suite_logs/
cd /root/repo
mkdir -p .suite_logs
OUT=SUITE_CPU_r02b.txt
: > "$OUT"
FILES=(
  tests/test_glv.py
  tests/test_groth16_native.py
  tests/test_kzg.py
  tests/test_layout.py
  tests/test_merkle_challenger.py
  tests/test_mixed_radix.py
  tests/test_multiopen.py
  tests/test_native_io.py
  tests/test_pairing_bls12.py
  tests/test_pedersen_binmerkle.py
  tests/test_poseidon.py
  tests/test_poseidon2.py
  tests/test_proof_hygiene.py
  tests/test_selector_compression.py
  tests/test_stringifier.py
  tests/test_sumcheck_mle.py
  tests/test_transcript.py
  tests/test_ntt.py
  tests/test_msm.py
  tests/test_parallel.py
  tests/test_plonk.py
  tests/test_plonk_blinding.py
  tests/test_plonk_lookup.py
)
for f in "${FILES[@]}"; do
  name=$(basename "$f" .py)
  start=$(date +%s)
  TACHYON_TEST_CPU=1 timeout 2400 python -m pytest "$f" -q \
    > ".suite_logs/$name.log" 2>&1
  rc=$?
  end=$(date +%s)
  tailline=$(grep -E "(passed|failed|error)" ".suite_logs/$name.log" | tail -1)
  echo "$f rc=$rc $((end-start))s :: $tailline" >> "$OUT"
done
echo DONE >> "$OUT"
