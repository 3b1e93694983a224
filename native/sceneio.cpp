// Native Scene I/O: multithreaded npz (zip+deflate+npy) frame reader.
//
// The TPU-native runtime counterpart of the reference's host-side data path:
// the reference preloads thousands of npz frames through Python
// (np.load per file inside PhifDataset.__init__,
// /root/reference/karman-2d/karman_train.py:221-229). This library parses the
// zip container and npy header directly and inflates with zlib across a
// thread pool, feeding the framework's device-resident dataset builder
// without the Python/zipfile overhead.
//
// Exposed C ABI (ctypes-friendly):
//   silt_npz_read(path, out, out_capacity_f32, shape_out[4], ndim_out)
//       -> number of f32 elements written, or negative error code
//   silt_npz_read_batch(paths, n, out, stride_f32, nthreads)
//       -> 0 on success, else (negative) index-1 of first failing file
//
// Only little-endian float32/float64 C-order arrays are supported (the only
// dtypes the Scene format produces); float64 is converted to float32.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <zlib.h>

namespace {

struct Buf {
  std::vector<unsigned char> data;
};

// --- minimal zip reader (single- or few-member archives from np.savez) -----

#pragma pack(push, 1)
struct LocalFileHeader {
  uint32_t sig;        // 0x04034b50
  uint16_t version;
  uint16_t flags;
  uint16_t method;     // 0 = stored, 8 = deflate
  uint16_t mtime, mdate;
  uint32_t crc32;
  uint32_t csize;
  uint32_t usize;
  uint16_t name_len;
  uint16_t extra_len;
};
#pragma pack(pop)

bool read_file(const char* path, Buf& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.data.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// Extract the first .npy member's decompressed bytes.
bool zip_first_member(const Buf& zip, Buf& out) {
  const unsigned char* p = zip.data.data();
  size_t n = zip.data.size();
  size_t off = 0;
  while (off + sizeof(LocalFileHeader) <= n) {
    LocalFileHeader h;
    std::memcpy(&h, p + off, sizeof(h));
    if (h.sig != 0x04034b50u) return false;
    size_t data_off = off + sizeof(h) + h.name_len + h.extra_len;
    uint64_t csize = h.csize, usize = h.usize;
    if (csize == 0xFFFFFFFFu || usize == 0xFFFFFFFFu) {
      // zip64: sizes live in the extended-info extra field (id 0x0001),
      // ordered usize then csize (numpy's savez always writes zip64)
      size_t ex = off + sizeof(h) + h.name_len;
      size_t ex_end = ex + h.extra_len;
      while (ex + 4 <= ex_end) {
        uint16_t id, len;
        std::memcpy(&id, p + ex, 2);
        std::memcpy(&len, p + ex + 2, 2);
        if (id == 0x0001 && len >= 16) {
          std::memcpy(&usize, p + ex + 4, 8);
          std::memcpy(&csize, p + ex + 12, 8);
          break;
        }
        ex += 4 + len;
      }
      if (csize == 0xFFFFFFFFu || usize == 0xFFFFFFFFu) return false;
    }
    if ((h.flags & 0x8) && csize == 0) {
      // data descriptor after payload (np.savez doesn't produce this; bail)
      return false;
    }
    if (data_off + csize > n) return false;
    if (h.method == 0) {
      out.data.assign(p + data_off, p + data_off + csize);
      return true;
    }
    if (h.method == 8) {
      out.data.resize(usize);
      z_stream zs{};
      if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
      zs.next_in = const_cast<unsigned char*>(p + data_off);
      zs.avail_in = static_cast<uInt>(csize);
      zs.next_out = out.data.data();
      zs.avail_out = static_cast<uInt>(usize);
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      return rc == Z_STREAM_END;
    }
    return false;
  }
  return false;
}

// --- npy header -------------------------------------------------------------

struct NpyInfo {
  bool f64 = false;
  int ndim = 0;
  long shape[8] = {0};
  size_t data_off = 0;
  size_t count = 0;
};

bool parse_npy(const Buf& npy, NpyInfo& info) {
  const unsigned char* p = npy.data.data();
  size_t n = npy.data.size();
  if (n < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    hoff = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) | (static_cast<size_t>(p[11]) << 24);
    hoff = 12;
  }
  if (hoff + hlen > n) return false;
  std::string hdr(reinterpret_cast<const char*>(p + hoff), hlen);

  if (hdr.find("'<f4'") != std::string::npos) info.f64 = false;
  else if (hdr.find("'<f8'") != std::string::npos) info.f64 = true;
  else return false;
  if (hdr.find("'fortran_order': False") == std::string::npos) return false;

  size_t sp = hdr.find("'shape':");
  if (sp == std::string::npos) return false;
  size_t lp = hdr.find('(', sp);
  size_t rp = hdr.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) return false;
  std::string dims = hdr.substr(lp + 1, rp - lp - 1);
  info.ndim = 0;
  info.count = 1;
  const char* c = dims.c_str();
  while (*c && info.ndim < 8) {
    while (*c == ' ' || *c == ',') ++c;
    if (!*c) break;
    char* end;
    long v = std::strtol(c, &end, 10);
    if (end == c) break;
    info.shape[info.ndim++] = v;
    info.count *= static_cast<size_t>(v);
    c = end;
  }
  info.data_off = hoff + hlen;
  return info.data_off + info.count * (info.f64 ? 8 : 4) <= n;
}

long read_one(const char* path, float* out, long capacity, long* shape_out,
              int* ndim_out) {
  Buf zip, npy;
  if (!read_file(path, zip)) return -1;
  if (!zip_first_member(zip, npy)) return -2;
  NpyInfo info;
  if (!parse_npy(npy, info)) return -3;
  if (static_cast<long>(info.count) > capacity) return -4;
  const unsigned char* src = npy.data.data() + info.data_off;
  if (info.f64) {
    const double* d = reinterpret_cast<const double*>(src);
    for (size_t i = 0; i < info.count; ++i) out[i] = static_cast<float>(d[i]);
  } else {
    std::memcpy(out, src, info.count * 4);
  }
  if (shape_out && ndim_out) {
    *ndim_out = info.ndim;
    for (int i = 0; i < info.ndim; ++i) shape_out[i] = info.shape[i];
  }
  return static_cast<long>(info.count);
}

}  // namespace

extern "C" {

long silt_npz_read(const char* path, float* out, long capacity,
                   long* shape_out, int* ndim_out) {
  return read_one(path, out, capacity, shape_out, ndim_out);
}

long silt_npz_read_batch(const char** paths, long n, float* out,
                         long stride, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<long> next(0);
  std::atomic<long> failed(0);  // 0 = ok, else index+1 of first failure
  auto worker = [&]() {
    long i;
    while ((i = next.fetch_add(1)) < n) {
      long got = read_one(paths[i], out + i * stride, stride, nullptr, nullptr);
      if (got < 0) {
        long expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return -failed.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// npz writer: np.load-compatible zip(deflate)+npy, with a controllable
// compression level (np.savez_compressed pins zlib level 6; level 1 is
// ~5x faster deflate for ~10% larger files — the data-generation pipelines
// are host-compression-bound, BENCH.md).
// ---------------------------------------------------------------------------

namespace {

void put16(std::vector<unsigned char>& b, uint16_t v) {
  b.push_back(v & 0xff); b.push_back((v >> 8) & 0xff);
}
void put32(std::vector<unsigned char>& b, uint32_t v) {
  for (int i = 0; i < 4; ++i) b.push_back((v >> (8 * i)) & 0xff);
}

std::vector<unsigned char> make_npy(const float* data, const long* shape, int ndim) {
  std::string dict = "{'descr': '<f4', 'fortran_order': False, 'shape': (";
  size_t count = 1;
  for (int i = 0; i < ndim; ++i) {
    dict += std::to_string(shape[i]);
    if (ndim == 1 || i + 1 < ndim) dict += ",";
    if (i + 1 < ndim) dict += " ";
    count *= static_cast<size_t>(shape[i]);
  }
  dict += "), }";
  size_t hlen = 10 + dict.size() + 1;          // magic+ver+len + dict + \n
  size_t pad = (64 - (hlen % 64)) % 64;        // align to 64
  dict += std::string(pad, ' ');
  dict += "\n";
  std::vector<unsigned char> out;
  const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
  out.insert(out.end(), magic, magic + 8);
  put16(out, static_cast<uint16_t>(dict.size()));
  out.insert(out.end(), dict.begin(), dict.end());
  const unsigned char* raw = reinterpret_cast<const unsigned char*>(data);
  out.insert(out.end(), raw, raw + count * 4);
  return out;
}

bool deflate_raw(const std::vector<unsigned char>& in, std::vector<unsigned char>& out,
                 int level) {
  uLong bound = compressBound(in.size());
  out.resize(bound);
  z_stream zs{};
  if (deflateInit2(&zs, level, Z_DEFLATED, -MAX_WBITS, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return false;
  zs.next_in = const_cast<unsigned char*>(in.data());
  zs.avail_in = in.size();
  zs.next_out = out.data();
  zs.avail_out = bound;
  int rc = deflate(&zs, Z_FINISH);
  out.resize(zs.total_out);
  deflateEnd(&zs);
  return rc == Z_STREAM_END;
}

bool write_npz_one(const char* path, const float* data, const long* shape,
                   int ndim, int level) {
  std::vector<unsigned char> npy = make_npy(data, shape, ndim);
  std::vector<unsigned char> comp;
  if (!deflate_raw(npy, comp, level)) return false;
  uint32_t crc = crc32(0L, npy.data(), npy.size());
  const std::string name = "arr_0.npy";

  std::vector<unsigned char> file;
  size_t local_off = 0;
  // local file header
  put32(file, 0x04034b50); put16(file, 20); put16(file, 0); put16(file, 8);
  put16(file, 0); put16(file, 0);
  put32(file, crc); put32(file, comp.size()); put32(file, npy.size());
  put16(file, name.size()); put16(file, 0);
  file.insert(file.end(), name.begin(), name.end());
  file.insert(file.end(), comp.begin(), comp.end());
  // central directory
  size_t cd_off = file.size();
  put32(file, 0x02014b50); put16(file, 20); put16(file, 20); put16(file, 0);
  put16(file, 8); put16(file, 0); put16(file, 0);
  put32(file, crc); put32(file, comp.size()); put32(file, npy.size());
  put16(file, name.size()); put16(file, 0); put16(file, 0);
  put16(file, 0); put16(file, 0); put32(file, 0); put32(file, local_off);
  file.insert(file.end(), name.begin(), name.end());
  size_t cd_size = file.size() - cd_off;
  // end of central directory
  put32(file, 0x06054b50); put16(file, 0); put16(file, 0); put16(file, 1);
  put16(file, 1); put32(file, cd_size); put32(file, cd_off); put16(file, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t wrote = std::fwrite(file.data(), 1, file.size(), f);
  std::fclose(f);
  return wrote == file.size();
}

}  // namespace

extern "C" {

long silt_npz_write(const char* path, const float* data, const long* shape,
                    int ndim, int level) {
  return write_npz_one(path, data, shape, ndim, level) ? 0 : -1;
}

long silt_npz_write_batch(const char** paths, long n, const float* data,
                          long stride, const long* shape, int ndim,
                          int level, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<long> next(0);
  std::atomic<long> failed(0);
  auto worker = [&]() {
    long i;
    while ((i = next.fetch_add(1)) < n) {
      if (!write_npz_one(paths[i], data + i * stride, shape, ndim, level)) {
        long expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return -failed.load();
}

}  // extern "C"
