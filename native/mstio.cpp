// mstio — native host-side volume IO for the mst_tpu data path.
//
// The reference's input pipeline spends its host CPU in torchio/nibabel
// Python code across 24 worker processes (reference
// `scripts/main_train.py:77`, SURVEY §3.1 hot loop #2/#3). This library
// moves the per-sample hot path — gzip inflate, NIfTI-1 parse, dtype
// conversion, scl scaling, crop-or-pad windowing — into C++ with a
// pthread worker pool, exposed to Python via a plain C ABI (ctypes;
// pybind11 is not available in this image).
//
// Layout convention: NIfTI stores Fortran-order [X, Y, Z]; the reader
// returns float32 in C order as [Z, Y, X] (== the framework's [D, H, W]),
// performing the transpose during conversion, which is exactly the
// `[C, W, H, D] -> [C, D, H, W]` swap of the reference
// (`augmentations_3d.py:19-21`) minus a Python copy.

#include <dlfcn.h>
#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <exception>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
struct MstVolume {
  float* data;       // C-order [Z, Y, X]
  int64_t shape[3];  // Z, Y, X
  double affine[16];
  int32_t ok;  // 1 on success
  char error[256];
};
}  // extern "C"

// ---------------------------------------------------------------------------
// libdeflate fast path (optional, dlopen'd at first use)
//
// zlib's streaming inflate is the measured bottleneck of the cold loader
// (~70% of per-volume decode, ROADMAP "input pipeline"). libdeflate's
// one-shot decompressor is 2-3x faster; both of our formats know their
// output size up front (gzip ISIZE trailer for .nii.gz, the chunk's
// dataset-layout size for HDF5 deflate), which is exactly the shape its
// whole-buffer API wants. The library is loaded dynamically so the .so
// keeps working (zlib path) on hosts without it.
// ---------------------------------------------------------------------------

namespace fastinflate {

struct LibDeflate {
  void* (*alloc_decompressor)(void);
  // enum libdeflate_result is int-compatible; 0 == LIBDEFLATE_SUCCESS
  int (*gzip_decompress_ex)(void*, const void*, size_t, void*, size_t,
                            size_t*, size_t*);
  int (*zlib_decompress)(void*, const void*, size_t, void*, size_t, size_t*);
};

static const LibDeflate* lib() {
  static LibDeflate table;
  static const LibDeflate* ptr = [] {
    void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_LOCAL);
    if (!h) return (const LibDeflate*)nullptr;
    table.alloc_decompressor = reinterpret_cast<void* (*)(void)>(
        dlsym(h, "libdeflate_alloc_decompressor"));
    table.gzip_decompress_ex =
        reinterpret_cast<int (*)(void*, const void*, size_t, void*, size_t,
                                 size_t*, size_t*)>(
            dlsym(h, "libdeflate_gzip_decompress_ex"));
    table.zlib_decompress =
        reinterpret_cast<int (*)(void*, const void*, size_t, void*, size_t,
                                 size_t*)>(
            dlsym(h, "libdeflate_zlib_decompress"));
    if (!table.alloc_decompressor || !table.gzip_decompress_ex ||
        !table.zlib_decompress)
      return (const LibDeflate*)nullptr;
    return (const LibDeflate*)&table;
  }();
  return ptr;
}

// Per-thread decompressor (not thread-safe to share; alloc once per pool
// thread and keep — the handful of pool threads never free it).
static void* decompressor() {
  const LibDeflate* ld = lib();
  if (!ld) return nullptr;
  static thread_local void* d = ld->alloc_decompressor();
  return d;
}

// One-shot gzip decode of a whole in-memory file. Returns false (without
// touching `out`) when the fast path doesn't apply — caller falls back to
// streaming zlib. Handles multi-member files by iterating members.
static bool gzip_decompress(const std::vector<uint8_t>& raw,
                            std::vector<uint8_t>& out) {
  const LibDeflate* ld = lib();
  void* d = decompressor();
  if (!ld || !d) return false;
  out.clear();
  size_t in_pos = 0;
  while (in_pos < raw.size()) {
    size_t remaining = raw.size() - in_pos;
    if (remaining < 18) return false;  // smaller than any valid member
    // ISIZE trailer = uncompressed size mod 2^32. Per-member we only see
    // the LAST member's trailer at raw end; for the common single-member
    // file it is exact. >=4 GiB payloads (ISIZE wrapped) get a short
    // buffer -> INSUFFICIENT_SPACE -> zlib fallback, never wrong data.
    const uint8_t* tail = raw.data() + raw.size() - 4;
    uint64_t isize = (uint64_t)tail[0] | ((uint64_t)tail[1] << 8) |
                     ((uint64_t)tail[2] << 16) | ((uint64_t)tail[3] << 24);
    size_t out_pos = out.size();
    // Guard absurd ratios (corrupt trailer): cap at 1024x the compressed
    // size, fall back to zlib beyond it rather than over-allocating.
    if (isize > (uint64_t)remaining * 1024 + (1 << 16)) return false;
    out.resize(out_pos + (size_t)isize);
    size_t actual_out = 0, actual_in = 0;
    // NB parameter order: actual_in_nbytes_ret precedes actual_out_.
    int rc = ld->gzip_decompress_ex(d, raw.data() + in_pos, remaining,
                                    out.data() + out_pos, (size_t)isize,
                                    &actual_in, &actual_out);
    if (rc != 0) return false;  // bad data / short buffer -> zlib decides
    out.resize(out_pos + actual_out);
    in_pos += actual_in;
  }
  return true;
}

// One-shot zlib-format decode with exact known output size (HDF5 deflate
// filter chunks). Returns false -> caller falls back to zlib uncompress.
static bool zlib_decompress_exact(const uint8_t* src, size_t src_len,
                                  uint8_t* dst, size_t dst_len) {
  const LibDeflate* ld = lib();
  void* d = decompressor();
  if (!ld || !d) return false;
  size_t actual = 0;
  return ld->zlib_decompress(d, src, src_len, dst, dst_len, &actual) == 0 &&
         actual == dst_len;
}

}  // namespace fastinflate

// h5lite.cpp links into the same .so and shares the fast path.
bool mstio_fast_zlib_decompress(const uint8_t* src, size_t src_len,
                                uint8_t* dst, size_t dst_len) {
  return fastinflate::zlib_decompress_exact(src, src_len, dst, dst_len);
}

// ---------------------------------------------------------------------------
// gzip / raw file loading
// ---------------------------------------------------------------------------

static bool load_file(const char* path, std::vector<uint8_t>& out,
                      char* err, size_t errlen) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(err, errlen, "cannot open %s", path);
    return false;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n < 0) {
    fclose(f);
    snprintf(err, errlen, "not a regular file: %s", path);
    return false;
  }
  std::vector<uint8_t> raw((size_t)n);
  if (fread(raw.data(), 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    snprintf(err, errlen, "short read on %s", path);
    return false;
  }
  fclose(f);

  if (n >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {  // gzip magic
    if (fastinflate::gzip_decompress(raw, out)) return true;
    out.clear();
    out.reserve(raw.size() * 4);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
      snprintf(err, errlen, "inflateInit failed");
      return false;
    }
    zs.next_in = raw.data();
    zs.avail_in = (uInt)raw.size();
    std::vector<uint8_t> chunk(1 << 20);
    int ret = Z_OK;
    for (;;) {
      zs.next_out = chunk.data();
      zs.avail_out = (uInt)chunk.size();
      ret = inflate(&zs, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        inflateEnd(&zs);
        snprintf(err, errlen, "inflate error %d on %s", ret, path);
        return false;
      }
      out.insert(out.end(), chunk.data(),
                 chunk.data() + (chunk.size() - zs.avail_out));
      if (ret == Z_STREAM_END) {
        // Multi-member gzip (pigz / concatenated streams, RFC 1952):
        // keep inflating while input remains, like Python's gzip module.
        if (zs.avail_in == 0) break;
        if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) break;
      }
    }
    inflateEnd(&zs);
  } else {
    out = std::move(raw);
  }
  return true;
}

// ---------------------------------------------------------------------------
// NIfTI-1 parsing (single-file .nii / .nii.gz, scalar dtypes)
// ---------------------------------------------------------------------------

template <typename T>
static void convert_transpose(const uint8_t* src, float* dst, int64_t X,
                              int64_t Y, int64_t Z, float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  // src is Fortran [X, Y, Z]: index x + X*(y + Y*z)
  // dst is C [Z, Y, X]:       index x + X*(y + Y*z) ... same linear layout!
  // (F-order XYZ and C-order ZYX share the memory layout.)
  const int64_t n = X * Y * Z;
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i];
  } else {
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i] * slope + inter;
  }
}

extern "C" {

void mstio_free(float* p) { free(p); }

// 1 when the libdeflate fast path is live (bench env detail: cold-decode
// numbers are not comparable across hosts with/without it).
int32_t mstio_has_libdeflate(void) {
  return fastinflate::lib() != nullptr ? 1 : 0;
}

static void read_nifti_impl(const char* path, MstVolume* vol) {
  vol->ok = 0;
  vol->data = nullptr;
  std::vector<uint8_t> buf;
  if (!load_file(path, buf, vol->error, sizeof(vol->error))) return;
  if (buf.size() < 352) {
    snprintf(vol->error, sizeof(vol->error), "truncated NIfTI: %s", path);
    return;
  }
  const uint8_t* h = buf.data();
  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, h, 4);
  if (sizeof_hdr != 348) {
    snprintf(vol->error, sizeof(vol->error),
             "unsupported endianness or not NIfTI-1: %s", path);
    return;
  }
  int16_t dim[8];
  memcpy(dim, h + 40, 16);
  int ndim = dim[0];
  if (ndim < 3) {
    snprintf(vol->error, sizeof(vol->error), "need >=3D volume: %s", path);
    return;
  }
  int64_t X = dim[1], Y = dim[2], Z = dim[3];
  for (int i = 4; i <= ndim; ++i) {
    if (dim[i] > 1) {
      snprintf(vol->error, sizeof(vol->error),
               ">3D volumes unsupported: %s", path);
      return;
    }
  }
  int16_t datatype, bitpix;
  memcpy(&datatype, h + 70, 2);
  memcpy(&bitpix, h + 72, 2);
  float pixdim[8];
  memcpy(pixdim, h + 76, 32);
  float vox_offset_f, scl_slope, scl_inter;
  memcpy(&vox_offset_f, h + 108, 4);
  memcpy(&scl_slope, h + 112, 4);
  memcpy(&scl_inter, h + 116, 4);
  int16_t sform_code;
  memcpy(&sform_code, h + 254, 2);
  float srow[12];
  memcpy(srow, h + 280, 48);

  // NaN slope/inter mean "no scaling" (nibabel semantics); NaN != 0 would
  // otherwise slip past the zero check and NaN the whole volume.
  if (scl_slope == 0.0f || scl_slope != scl_slope) scl_slope = 1.0f;
  if (scl_inter != scl_inter) scl_inter = 0.0f;
  size_t vox_offset = (size_t)vox_offset_f;
  int64_t n = X * Y * Z;
  // Element size from DATATYPE, not the (untrusted) bitpix field: a corrupt
  // header with small bitpix would pass this check and the typed conversion
  // below would read past the buffer.
  size_t elem = 0;
  switch (datatype) {
    case 2: case 256: elem = 1; break;
    case 4: case 512: elem = 2; break;
    case 8: case 16: elem = 4; break;
    case 64: elem = 8; break;
    default:
      snprintf(vol->error, sizeof(vol->error), "unsupported dtype %d: %s",
               datatype, path);
      return;
  }
  (void)bitpix;
  size_t need = vox_offset + (size_t)n * elem;
  if (buf.size() < need) {
    snprintf(vol->error, sizeof(vol->error), "data shorter than header: %s",
             path);
    return;
  }

  float* out = (float*)malloc(sizeof(float) * (size_t)n);
  if (!out) {
    snprintf(vol->error, sizeof(vol->error), "oom (%lld voxels)",
             (long long)n);
    return;
  }
  const uint8_t* d = buf.data() + vox_offset;
  switch (datatype) {
    case 2: convert_transpose<uint8_t>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 4: convert_transpose<int16_t>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 8: convert_transpose<int32_t>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 16: convert_transpose<float>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 64: convert_transpose<double>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 256: convert_transpose<int8_t>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    case 512: convert_transpose<uint16_t>(d, out, X, Y, Z, scl_slope, scl_inter); break;
    default:
      free(out);
      snprintf(vol->error, sizeof(vol->error), "unsupported dtype %d: %s",
               datatype, path);
      return;
  }

  // affine: sform rows when present, else pixdim diagonal
  for (int i = 0; i < 16; ++i) vol->affine[i] = 0.0;
  vol->affine[15] = 1.0;
  if (sform_code > 0) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) vol->affine[r * 4 + c] = srow[r * 4 + c];
  } else {
    vol->affine[0] = pixdim[1];
    vol->affine[5] = pixdim[2];
    vol->affine[10] = pixdim[3];
  }
  vol->data = out;
  vol->shape[0] = Z;
  vol->shape[1] = Y;
  vol->shape[2] = X;
  vol->ok = 1;
}

void mstio_read_nifti(const char* path, MstVolume* vol) {
  // C++ exceptions (std::bad_alloc on huge/corrupt sizes) must not cross
  // the C ABI into ctypes — that would std::terminate the Python process
  // instead of honouring the ok=0 + error-string contract.
  try {
    read_nifti_impl(path, vol);
  } catch (const std::exception& e) {
    vol->ok = 0;
    vol->data = nullptr;
    snprintf(vol->error, sizeof(vol->error), "exception: %s (%s)", e.what(),
             path);
  } catch (...) {
    vol->ok = 0;
    vol->data = nullptr;
    snprintf(vol->error, sizeof(vol->error), "unknown exception (%s)", path);
  }
}

// ---------------------------------------------------------------------------
// crop-or-pad on the [Z, Y, X] layout (fill with a constant)
// ---------------------------------------------------------------------------

void mstio_crop_or_pad(const float* src, const int64_t* src_shape,
                       float* dst, const int64_t* dst_shape,
                       const int64_t* start,  // window start in padded coords
                       float fill) {
  const int64_t sz = src_shape[0], sy = src_shape[1], sx = src_shape[2];
  const int64_t dz = dst_shape[0], dy = dst_shape[1], dx = dst_shape[2];
  for (int64_t z = 0; z < dz; ++z) {
    int64_t zsrc = z + start[0];
    for (int64_t y = 0; y < dy; ++y) {
      int64_t ysrc = y + start[1];
      float* row = dst + (z * dy + y) * dx;
      if (zsrc < 0 || zsrc >= sz || ysrc < 0 || ysrc >= sy) {
        for (int64_t x = 0; x < dx; ++x) row[x] = fill;
        continue;
      }
      const float* srow = src + (zsrc * sy + ysrc) * sx;
      for (int64_t x = 0; x < dx; ++x) {
        int64_t xsrc = x + start[2];
        row[x] = (xsrc < 0 || xsrc >= sx) ? fill : srow[xsrc];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// threaded batch read: n paths -> n MstVolume results
// ---------------------------------------------------------------------------

void mstio_read_batch(const char** paths, int32_t n, MstVolume* out,
                      int32_t num_threads) {
  if (num_threads <= 1 || n <= 1) {
    for (int32_t i = 0; i < n; ++i) mstio_read_nifti(paths[i], &out[i]);
    return;
  }
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      mstio_read_nifti(paths[i], &out[i]);
    }
  };
  std::vector<std::thread> threads;
  int32_t nt = num_threads < n ? num_threads : n;
  threads.reserve((size_t)nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

int32_t mstio_version() { return 1; }

}  // extern "C"
