// Minimal .npz (ZIP of .npy) reader — the native consumer of the export
// format written by serve/export.py (np.savez => ZIP_STORED entries only).
//
// The reference's C++ runtime loads its model straight from MXNet symbol
// JSON + .params buffers (Feature.hpp:163-219, MXPredCreatePartialOut);
// the TPU-era equivalent loads the flat key->array weights.npz + JSON
// manifest without any Python in the process.

#pragma once

#include <cstdint>
#include <cstdlib>
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
  // every offset below derives from UNTRUSTED file bytes: check before
  // each dereference, throw clean errors, never read past buf + len
  if (len < 12 || std::memcmp(buf, "\x93NUMPY", 6) != 0)
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
  if (hlen > len - hoff)
    throw std::runtime_error("npy: header length exceeds entry");
  std::string header(buf + hoff, hlen);
  NpyArray arr;
  // descr
  size_t d = header.find("'descr'");
  if (d == std::string::npos) throw std::runtime_error("npy: no descr");
  size_t q1 = header.find('\'', d + 7);
  size_t q2 = (q1 == std::string::npos) ? std::string::npos
                                        : header.find('\'', q1 + 1);
  if (q2 == std::string::npos)
    throw std::runtime_error("npy: malformed descr");
  arr.dtype = header.substr(q1 + 1, q2 - q1 - 1);
  if (header.find("'fortran_order': False") == std::string::npos)
    throw std::runtime_error("npy: fortran_order not supported");
  // shape tuple
  size_t sp = header.find("'shape'");
  size_t p1 = (sp == std::string::npos) ? std::string::npos
                                        : header.find('(', sp);
  size_t p2 = (p1 == std::string::npos) ? std::string::npos
                                        : header.find(')', p1);
  if (p2 == std::string::npos)
    throw std::runtime_error("npy: malformed shape");
  std::string tup = header.substr(p1 + 1, p2 - p1 - 1);
  size_t pos = 0;
  while (pos < tup.size()) {
    while (pos < tup.size() && (tup[pos] == ' ' || tup[pos] == ',')) ++pos;
    if (pos >= tup.size()) break;
    try {
      arr.shape.push_back(std::stoll(tup.substr(pos)));
    } catch (const std::exception&) {
      throw std::runtime_error("npy: malformed shape value");
    }
    while (pos < tup.size() && tup[pos] != ',') ++pos;
  }
  size_t payload = hoff + hlen;
  arr.data.assign(buf + payload, buf + len);
  // the SHAPE is untrusted too: consumers index f32() by size(), so a
  // header claiming more elements than the payload holds would move the
  // overread from the parser into every consumer
  int64_t count = 1;
  for (int64_t s : arr.shape) {
    if (s < 0 || (s > 0 && count > (int64_t(1) << 40) / s))
      throw std::runtime_error("npy: implausible shape");
    count *= s;
  }
  if (arr.dtype.size() >= 3) {
    const long width = std::strtol(arr.dtype.c_str() + 2, nullptr, 10);
    if (width > 0 &&
        static_cast<uint64_t>(count) * width > arr.data.size())
      throw std::runtime_error("npy: shape exceeds payload");
  }
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

  // find End Of Central Directory (scan back for PK\x05\x06). Every
  // offset/length parsed below comes from UNTRUSTED file bytes — bound
  // each one against flen before dereferencing (a corrupt export must
  // throw, never read out of bounds).
  if (flen < 22) throw std::runtime_error("npz: file too small");
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
    if (p > flen || flen - p < 46 ||
        std::memcmp(buf.data() + p, "PK\x01\x02", 4) != 0)
      throw std::runtime_error("npz: bad central-directory entry");
    const uint16_t method = detail::rd16(buf.data() + p + 10);
    const uint32_t csize = detail::rd32(buf.data() + p + 20);
    const uint16_t nlen = detail::rd16(buf.data() + p + 28);
    const uint16_t xlen = detail::rd16(buf.data() + p + 30);
    const uint16_t clen = detail::rd16(buf.data() + p + 32);
    const uint32_t lho = detail::rd32(buf.data() + p + 42);
    if (nlen > flen - p - 46)
      throw std::runtime_error("npz: entry name exceeds file");
    std::string name(buf.data() + p + 46, nlen);
    if (method != 0)
      throw std::runtime_error("npz: compressed entry (np.savez_compressed?)"
                               " not supported: " + name);
    // local header: skip its (possibly different) name/extra lengths
    if (lho > flen || flen - lho < 30)
      throw std::runtime_error("npz: local header offset exceeds file");
    const uint16_t lnlen = detail::rd16(buf.data() + lho + 26);
    const uint16_t lxlen = detail::rd16(buf.data() + lho + 28);
    const size_t doff = lho + 30 + static_cast<size_t>(lnlen) + lxlen;
    if (doff > flen || csize > flen - doff)
      throw std::runtime_error("npz: entry data exceeds file");
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    out[name] = detail::parse_npy(buf.data() + doff, csize);
    p += 46 + static_cast<size_t>(nlen) + xlen + clen;
  }
  return out;
}

}  // namespace facejax
