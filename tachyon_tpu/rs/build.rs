// Links libtachyon_tpu_c.so, built by `make -C tachyon_tpu/c`.
// Set TACHYON_TPU_C_DIR to the directory containing the library
// (defaults to ../c relative to this crate).
fn main() {
    let dir = std::env::var("TACHYON_TPU_C_DIR").unwrap_or_else(|_| "../c".into());
    println!("cargo:rustc-link-search=native={dir}");
    println!("cargo:rustc-link-lib=dylib=tachyon_tpu_c");
    println!("cargo:rerun-if-env-changed=TACHYON_TPU_C_DIR");
}
