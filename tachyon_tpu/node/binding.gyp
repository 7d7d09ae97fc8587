{
  "targets": [
    {
      "target_name": "tachyon_tpu",
      "sources": ["src/addon.c"],
      "libraries": [
        "-L<!(echo ${TACHYON_TPU_C_DIR:-../../c})",
        "-ltachyon_tpu_c",
        "-Wl,-rpath,<!(echo ${TACHYON_TPU_C_DIR:-../../c})"
      ],
      "include_dirs": ["../c"],
      "cflags": ["-std=c11"]
    }
  ]
}
