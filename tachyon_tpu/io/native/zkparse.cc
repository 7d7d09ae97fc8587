// Native zkey/wtns parser: mmap + byte->16-bit-limb repacking.
//
// Analog of the reference's mmap-based circom parsers
// (reference: vendors/circom/circomlib/zkey/zkey.cc, wtns/wtns.h,
// base/files/memory_mapped_file.h).  Exposed as a plain C ABI consumed via
// ctypes (tachyon_tpu/io/native.py); the Python parser in io/zkey.py is the
// portable fallback and the correctness oracle.
//
// Build: make -C tachyon_tpu/io/native
#include <cstdint>
#include <cstring>
#include <cstdio>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct MappedFile {
  const uint8_t* data;
  uint64_t size;
  int fd;
};

// Opens and maps a file read-only. Returns 0 on success.
int zk_mmap_open(const char* path, MappedFile* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -2;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    close(fd);
    return -3;
  }
  out->data = static_cast<const uint8_t*>(p);
  out->size = st.st_size;
  out->fd = fd;
  return 0;
}

void zk_mmap_close(MappedFile* f) {
  if (f->data) munmap(const_cast<uint8_t*>(f->data), f->size);
  if (f->fd >= 0) close(f->fd);
  f->data = nullptr;
  f->fd = -1;
}

// Locates a section (magic-framed container: magic u32, version u32,
// n_sections u32, then [type u32, size u64, payload]*).
// Returns payload offset or 0 if absent; size via out param.
// `occurrence` selects the k-th section of that type.
uint64_t zk_find_section(const MappedFile* f, uint32_t type,
                         uint32_t occurrence, uint64_t* size_out) {
  if (f->size < 12) return 0;
  uint32_t n_sections;
  memcpy(&n_sections, f->data + 8, 4);
  uint64_t off = 12;
  uint32_t seen = 0;
  for (uint32_t i = 0; i < n_sections && off + 12 <= f->size; ++i) {
    uint32_t t;
    uint64_t sz;
    memcpy(&t, f->data + off, 4);
    memcpy(&sz, f->data + off + 4, 8);
    off += 12;
    if (t == type) {
      if (seen == occurrence) {
        *size_out = sz;
        return off;
      }
      ++seen;
    }
    off += sz;
  }
  return 0;
}

// Repacks n big-integer values of n8 bytes each (little-endian, contiguous
// at data+off) into 16-bit limbs stored in uint32, LIMB-MAJOR layout:
// out[l * n + i] = limb l of value i.  (This is the (L, n) device layout,
// so the arrays upload with zero further transformation.)
void zk_repack_limbs(const MappedFile* f, uint64_t off, uint64_t n,
                     uint32_t n8, uint32_t* out) {
  const uint8_t* src = f->data + off;
  uint32_t L = n8 / 2;
  for (uint64_t i = 0; i < n; ++i) {
    const uint8_t* v = src + i * n8;
    for (uint32_t l = 0; l < L; ++l) {
      out[(uint64_t)l * n + i] =
          (uint32_t)v[2 * l] | ((uint32_t)v[2 * l + 1] << 8);
    }
  }
}

// Strided variant for interleaved records (e.g. coefficient entries:
// stride bytes apart, value at +value_off).
void zk_repack_limbs_strided(const MappedFile* f, uint64_t off, uint64_t n,
                             uint32_t stride, uint32_t value_off, uint32_t n8,
                             uint32_t* out) {
  const uint8_t* src = f->data + off;
  uint32_t L = n8 / 2;
  for (uint64_t i = 0; i < n; ++i) {
    const uint8_t* v = src + i * stride + value_off;
    for (uint32_t l = 0; l < L; ++l) {
      out[(uint64_t)l * n + i] =
          (uint32_t)v[2 * l] | ((uint32_t)v[2 * l + 1] << 8);
    }
  }
}

// Gathers u32 fields from strided records (coefficient matrix/constraint/
// signal columns).
void zk_gather_u32(const MappedFile* f, uint64_t off, uint64_t n,
                   uint32_t stride, uint32_t field_off, uint32_t* out) {
  const uint8_t* src = f->data + off;
  for (uint64_t i = 0; i < n; ++i) {
    memcpy(&out[i], src + i * stride + field_off, 4);
  }
}

}  // extern "C"
