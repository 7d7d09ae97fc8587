// Smoke test (requires a built addon + libtachyon_tpu_c.so on the
// loader path): node test.js
"use strict";
const assert = require("assert");
const t = require("./index.js");

assert.strictEqual(t.version(), 200);
t.init("cpu");

// all-infinity MSM returns infinity (zero-encoded)
const bases = Buffer.alloc(64 * 4);
const scalars = Buffer.alloc(32 * 4);
assert.ok(t.msmBn254G1(bases, scalars).equals(Buffer.alloc(64)));

// FFT roundtrip
const coeffs = Buffer.alloc(32 * 4);
for (let i = 0; i < 4; i++) coeffs[32 * i] = i + 1;
const evals = t.fftBn254Fr(coeffs, false);
assert.ok(t.fftBn254Fr(evals, true).equals(coeffs));

console.log("node binding smoke OK");
