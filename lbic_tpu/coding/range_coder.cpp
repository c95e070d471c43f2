// Range coder backend — the alternative entropy coder.
//
// The reference exposes two coders behind one API: compressai's rANS
// (default) and the `range_coder` package's range coder
// (entropy_layers_cai.py:33-51). This is our native second backend: a
// 32-bit carry-rippling range coder driven by the SAME quantized CDF
// tables and the SAME escape scheme (zigzag + 3x11-bit bypass chunks,
// escape slot at cdf_len-2) as rans.cpp, so the two backends are
// drop-in interchangeable at identical rate.
//
// Bit-for-bit the same stream format as range_coder_py.py (the
// cross-backend test oracle). FIFO symbol order (unlike rANS's LIFO).
//
// Build: compiled into librans.so together with rans.cpp (build.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecision = 16;
constexpr int kBypassBits = 11;
constexpr int kBypassChunks = 3;
constexpr uint32_t kTop = 1u << 24;

inline uint64_t zigzag(int64_t v) {
  return (static_cast<uint64_t>(v) << 1) ^ static_cast<uint64_t>(v >> 63);
}

inline int64_t unzigzag(uint64_t z) {
  return static_cast<int64_t>(z >> 1) ^ -static_cast<int64_t>(z & 1);
}

struct RcEncoder {
  // active window is bits [0,32) of low; bit 32 is the pending carry,
  // rippled directly into the emitted buffer through any 0xFF run
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  std::vector<uint8_t> out;

  void emit() {
    if (low > 0xFFFFFFFFull) {  // carry
      size_t i = out.size() - 1;
      while (out[i] == 0xFF) out[i--] = 0;
      out[i]++;
    }
    out.push_back(static_cast<uint8_t>(low >> 24));
    low = (low & 0xFFFFFFull) << 8;
  }

  void encode(uint32_t start, uint32_t freq, int tot_bits = kPrecision) {
    range >>= tot_bits;
    low += static_cast<uint64_t>(start) * range;
    range *= freq;
    while (range < kTop) {
      emit();
      range <<= 8;
    }
  }

  void encode_bits(uint32_t bits, int nbits) {
    range >>= nbits;
    low += static_cast<uint64_t>(bits) * range;
    while (range < kTop) {
      emit();
      range <<= 8;
    }
  }

  void flush() {
    for (int i = 0; i < 4; i++) emit();
  }
};

struct RcDecoder {
  const uint8_t* buf;
  int64_t len, pos = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;

  RcDecoder(const uint8_t* b, int64_t n) : buf(b), len(n) {
    for (int i = 0; i < 4; i++) code = (code << 8) | byte();
  }

  uint8_t byte() { return pos < len ? buf[pos++] : 0; }

  void renorm() {
    // invariant code < range, so code < 2^24 here: no overflow
    while (range < kTop) {
      code = (code << 8) | byte();
      range <<= 8;
    }
  }

  int32_t decode_cdf(const int32_t* row, int32_t cdf_len) {
    range >>= kPrecision;
    uint32_t val = code / range;
    if (val > (1u << kPrecision) - 1) val = (1u << kPrecision) - 1;
    int32_t lo = 0, hi = cdf_len - 1;
    while (hi - lo > 1) {
      int32_t mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(row[mid]) <= val) lo = mid;
      else hi = mid;
    }
    code -= static_cast<uint32_t>(row[lo]) * range;
    range *= static_cast<uint32_t>(row[lo + 1] - row[lo]);
    renorm();
    return lo;
  }

  uint32_t decode_bits(int nbits) {
    range >>= nbits;
    uint32_t val = code / range;
    if (val > (1u << nbits) - 1) val = (1u << nbits) - 1;
    code -= val * range;
    renorm();
    return val;
  }
};

}  // namespace

extern "C" {

int64_t lbic_rc_encode(const int32_t* symbols, const int32_t* indexes,
                       int64_t n, const int32_t* cdfs, int32_t n_cdfs,
                       int32_t cdf_stride, const int32_t* cdf_lengths,
                       const int32_t* offsets, uint8_t* out,
                       int64_t out_cap) {
  RcEncoder enc;
  enc.out.reserve(static_cast<size_t>(n) + 64);
  for (int64_t i = 0; i < n; i++) {
    const int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_cdfs) return -2;
    const int32_t* row = cdfs + static_cast<int64_t>(idx) * cdf_stride;
    const int32_t max_value = cdf_lengths[idx] - 2;
    int64_t value = static_cast<int64_t>(symbols[i]) - offsets[idx];
    if (value >= 0 && value < max_value) {
      enc.encode(row[value], row[value + 1] - row[value]);
    } else {
      enc.encode(row[max_value], row[max_value + 1] - row[max_value]);
      const uint64_t z =
          zigzag(value >= max_value ? value - max_value : value);
      for (int c = 0; c < kBypassChunks; c++) {
        enc.encode_bits(
            static_cast<uint32_t>(z >> (c * kBypassBits)) &
                ((1u << kBypassBits) - 1),
            kBypassBits);
      }
    }
  }
  enc.flush();
  if (static_cast<int64_t>(enc.out.size()) > out_cap) return -1;
  std::memcpy(out, enc.out.data(), enc.out.size());
  return static_cast<int64_t>(enc.out.size());
}

void* lbic_rc_decoder_new(const uint8_t* stream, int64_t len) {
  if (len < 4) return nullptr;
  auto* d = new RcDecoder(stream, len);
  return d;
}

void lbic_rc_decoder_free(void* dec) {
  delete static_cast<RcDecoder*>(dec);
}

int32_t lbic_rc_decode_stream(void* dec, const int32_t* indexes, int64_t n,
                              const int32_t* cdfs, int32_t n_cdfs,
                              int32_t cdf_stride, const int32_t* cdf_lengths,
                              const int32_t* offsets, int32_t* out) {
  auto* d = static_cast<RcDecoder*>(dec);
  for (int64_t i = 0; i < n; i++) {
    const int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_cdfs) return -2;
    const int32_t* row = cdfs + static_cast<int64_t>(idx) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;
    const int32_t s = d->decode_cdf(row, cdf_len);
    int64_t value;
    if (s == max_value) {
      uint64_t z = 0;
      for (int c = 0; c < kBypassChunks; c++) {
        z |= static_cast<uint64_t>(d->decode_bits(kBypassBits))
             << (c * kBypassBits);
      }
      const int64_t raw = unzigzag(z);
      value = raw >= 0 ? raw + max_value : raw;
    } else {
      value = s;
    }
    out[i] = static_cast<int32_t>(value + offsets[idx]);
  }
  return 0;
}

}  // extern "C"
