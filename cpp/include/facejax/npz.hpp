// Minimal .npz (ZIP of .npy) reader — the native consumer of the export
// format written by serve/export.py (np.savez => ZIP_STORED entries only).
//
// The reference's C++ runtime loads its model straight from MXNet symbol
// JSON + .params buffers (Feature.hpp:163-219, MXPredCreatePartialOut);
// the TPU-era equivalent loads the flat key->array weights.npz + JSON
// manifest without any Python in the process.

#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace facejax {

struct NpyArray {
  std::vector<int64_t> shape;
  std::string dtype;        // numpy descr, e.g. "<f4", "<i8"
  std::vector<char> data;   // raw little-endian buffer

  int64_t size() const {
    int64_t n = 1;
    for (int64_t s : shape) n *= s;
    return n;
  }
  const float* f32() const {
    if (dtype != "<f4")
      throw std::runtime_error("npy: expected <f4, got " + dtype);
    return reinterpret_cast<const float*>(data.data());
  }
};

namespace detail {

inline uint16_t rd16(const char* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}
inline uint32_t rd32(const char* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Parse an .npy header+payload out of a raw buffer.
inline NpyArray parse_npy(const char* buf, size_t len) {
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("npy: bad magic");
  const uint8_t major = static_cast<uint8_t>(buf[6]);
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(buf + 8);
    hoff = 10;
  } else {  // version 2/3: 4-byte header length
    hlen = rd32(buf + 8);
    hoff = 12;
  }
  std::string header(buf + hoff, hlen);
  NpyArray arr;
  // descr
  size_t d = header.find("'descr'");
  size_t q1 = header.find('\'', d + 7);
  size_t q2 = header.find('\'', q1 + 1);
  arr.dtype = header.substr(q1 + 1, q2 - q1 - 1);
  if (header.find("'fortran_order': False") == std::string::npos)
    throw std::runtime_error("npy: fortran_order not supported");
  // shape tuple
  size_t sp = header.find("'shape'");
  size_t p1 = header.find('(', sp);
  size_t p2 = header.find(')', p1);
  std::string tup = header.substr(p1 + 1, p2 - p1 - 1);
  size_t pos = 0;
  while (pos < tup.size()) {
    while (pos < tup.size() && (tup[pos] == ' ' || tup[pos] == ',')) ++pos;
    if (pos >= tup.size()) break;
    arr.shape.push_back(std::stoll(tup.substr(pos)));
    while (pos < tup.size() && tup[pos] != ',') ++pos;
  }
  size_t payload = hoff + hlen;
  arr.data.assign(buf + payload, buf + len);
  return arr;
}

}  // namespace detail

// Load every entry of an uncompressed (ZIP_STORED) .npz. Keys are the
// archive names with the trailing ".npy" stripped.
inline std::map<std::string, NpyArray> LoadNpz(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("npz: cannot open " + path);
  f.seekg(0, std::ios::end);
  const size_t flen = static_cast<size_t>(f.tellg());
  std::vector<char> buf(flen);
  f.seekg(0);
  f.read(buf.data(), static_cast<std::streamsize>(flen));

  // find End Of Central Directory (scan back for PK\x05\x06)
  size_t eocd = std::string::npos;
  for (size_t i = flen - 22 + 1; i-- > 0;) {
    if (std::memcmp(buf.data() + i, "PK\x05\x06", 4) == 0) {
      eocd = i;
      break;
    }
  }
  if (eocd == std::string::npos)
    throw std::runtime_error("npz: no end-of-central-directory");
  const uint16_t n_entries = detail::rd16(buf.data() + eocd + 10);
  uint32_t cd_off = detail::rd32(buf.data() + eocd + 16);

  std::map<std::string, NpyArray> out;
  size_t p = cd_off;
  for (int e = 0; e < n_entries; ++e) {
    if (std::memcmp(buf.data() + p, "PK\x01\x02", 4) != 0)
      throw std::runtime_error("npz: bad central-directory entry");
    const uint16_t method = detail::rd16(buf.data() + p + 10);
    const uint32_t csize = detail::rd32(buf.data() + p + 20);
    const uint16_t nlen = detail::rd16(buf.data() + p + 28);
    const uint16_t xlen = detail::rd16(buf.data() + p + 30);
    const uint16_t clen = detail::rd16(buf.data() + p + 32);
    const uint32_t lho = detail::rd32(buf.data() + p + 42);
    std::string name(buf.data() + p + 46, nlen);
    if (method != 0)
      throw std::runtime_error("npz: compressed entry (np.savez_compressed?)"
                               " not supported: " + name);
    // local header: skip its (possibly different) name/extra lengths
    const uint16_t lnlen = detail::rd16(buf.data() + lho + 26);
    const uint16_t lxlen = detail::rd16(buf.data() + lho + 28);
    const size_t doff = lho + 30 + lnlen + lxlen;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    out[name] = detail::parse_npy(buf.data() + doff, csize);
    p += 46 + nlen + xlen + clen;
  }
  return out;
}

}  // namespace facejax
