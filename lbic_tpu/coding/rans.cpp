// rANS entropy coder for lbic_tpu.
//
// Native replacement for the compressai.ans extension the reference depends
// on (BufferedRansEncoder / RansDecoder, used at
// graphs/models/BlockBasedImgCompLossy_net.py:9,153,183-185,213-235).
// Implemented from scratch: standard 64-bit rANS with 32-bit renormalization
// (the public rans64 construction), 16-bit quantized CDFs, and an
// escape+bypass path for out-of-range symbols.
//
// API design differs from compressai on purpose: everything is batched —
// encode takes whole int32 arrays (device-computed symbols/indexes are fed
// straight in, no per-block Python), and decode exposes "decode N symbols
// with these N cdf rows now" so the wavefront scheduler can pull one
// wavefront-step's worth of symbols per call.
//
// Stream format:
//   [u64 LE final state][u32 LE words, in decode order]
// Escape: cdf interval `max_value` (= cdf_length-2) is the escape symbol;
// the raw value is then bypass-coded as zigzag(value - max_value or value)
// in three 11-bit raw chunks (33 bits). tail_mass=1e-9 makes escapes
// vanishingly rare, so simplicity beats rate here.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecision = 16;  // CDF precision (must match cdf tables)
constexpr uint64_t kRansL = 1ull << 31;
constexpr int kBypassBits = 11;
constexpr int kBypassChunks = 3;  // 33 bits covers zigzag of int32

struct RansState {
  uint64_t x = kRansL;
};

// ---- encode primitives (operate on a word buffer in emission order) ----

inline void enc_put(RansState& r, std::vector<uint32_t>& out, uint32_t start,
                    uint32_t freq) {
  uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  while (r.x >= x_max) {
    out.push_back(static_cast<uint32_t>(r.x));
    r.x >>= 32;
  }
  r.x = ((r.x / freq) << kPrecision) + (r.x % freq) + start;
}

inline void enc_put_bits(RansState& r, std::vector<uint32_t>& out,
                         uint32_t bits, int nbits) {
  uint64_t x_max = (kRansL >> nbits) << 32;
  while (r.x >= x_max) {
    out.push_back(static_cast<uint32_t>(r.x));
    r.x >>= 32;
  }
  r.x = (r.x << nbits) | (bits & ((1u << nbits) - 1));
}

// ---- decode ----

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  RansState r;

  bool init(const uint8_t* data, int64_t len) {
    if (len < 8) return false;
    uint64_t x;
    std::memcpy(&x, data, 8);
    r.x = x;
    p = data + 8;
    end = data + len;
    return true;
  }

  inline void renorm() {
    while (r.x < kRansL) {
      if (p + 4 > end) {
        // Exhausted stream: pad with zeros (decoder past logical end).
        r.x <<= 32;
        return;
      }
      uint32_t w;
      std::memcpy(&w, p, 4);
      p += 4;
      r.x = (r.x << 32) | w;
    }
  }

  inline uint32_t get(const int32_t* cdf_row, int32_t cdf_len) {
    uint32_t peek = static_cast<uint32_t>(r.x) & ((1u << kPrecision) - 1);
    // binary search: find s with cdf[s] <= peek < cdf[s+1]
    int lo = 0, hi = cdf_len - 1;  // intervals [0, cdf_len-2]
    while (hi - lo > 1) {
      int mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(cdf_row[mid]) <= peek)
        lo = mid;
      else
        hi = mid;
    }
    uint32_t start = static_cast<uint32_t>(cdf_row[lo]);
    uint32_t freq = static_cast<uint32_t>(cdf_row[lo + 1]) - start;
    r.x = freq * (r.x >> kPrecision) + peek - start;
    renorm();
    return static_cast<uint32_t>(lo);
  }

  inline uint32_t get_bits(int nbits) {
    uint32_t bits = static_cast<uint32_t>(r.x) & ((1u << nbits) - 1);
    r.x >>= nbits;
    renorm();
    return bits;
  }
};

inline uint32_t zigzag(int64_t v) {
  return static_cast<uint32_t>((v << 1) ^ (v >> 63));
}

inline int64_t unzigzag(uint32_t z) {
  return static_cast<int64_t>(z >> 1) ^ -static_cast<int64_t>(z & 1);
}

}  // namespace

extern "C" {

// Encode n (symbol, index) pairs. cdfs is (n_rows, stride) row-major int32.
// Returns number of bytes written to `out`, or -1 if out_capacity too small,
// -2 on bad input. Symbols are raw integers; offsets map them to cdf bins.
int64_t lbic_rans_encode(const int32_t* symbols, const int32_t* indexes,
                         int64_t n, const int32_t* cdfs, int32_t n_rows,
                         int32_t stride, const int32_t* cdf_lengths,
                         const int32_t* offsets, uint8_t* out,
                         int64_t out_capacity) {
  // rANS is LIFO: walk the symbols in reverse so the decoder reads forward.
  std::vector<uint32_t> words;
  words.reserve(static_cast<size_t>(n) / 2 + 16);
  RansState r;
  for (int64_t i = n - 1; i >= 0; --i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_rows) return -2;
    const int32_t* row = cdfs + static_cast<int64_t>(idx) * stride;
    int32_t cdf_len = cdf_lengths[idx];
    int32_t max_value = cdf_len - 2;  // last real interval is the escape
    int64_t value = static_cast<int64_t>(symbols[i]) - offsets[idx];
    if (value >= 0 && value < max_value) {
      // In reverse order the bypass bits of THIS symbol must be encoded
      // before (i.e. pushed after) the escape — not applicable here.
      enc_put(r, words, static_cast<uint32_t>(row[value]),
              static_cast<uint32_t>(row[value + 1] - row[value]));
    } else {
      // escape + bypass. Decoder order: escape symbol, then chunks low->high.
      // Reverse-encode: chunks high->low first, then the escape interval.
      uint32_t z = zigzag(value - max_value >= 0 ? value - max_value
                                                 : value);  // see note below
      // NOTE: decoder recovers `value` from z plus the escape; to keep the
      // mapping bijective we zigzag the raw value relative to the range:
      //   value >= max_value -> encode 2*(value - max_value)
      //   value < 0          -> encode 2*(-value) - 1  (zigzag of negative)
      // zigzag(value - max_value) for value>=max_value gives even codes;
      // zigzag(value) for value<0 gives odd codes -> bijective.
      for (int c = kBypassChunks - 1; c >= 0; --c) {
        enc_put_bits(r, words, z >> (c * kBypassBits), kBypassBits);
      }
      enc_put(r, words, static_cast<uint32_t>(row[max_value]),
              static_cast<uint32_t>(row[max_value + 1] - row[max_value]));
    }
  }
  int64_t total = 8 + static_cast<int64_t>(words.size()) * 4;
  if (total > out_capacity) return -1;
  std::memcpy(out, &r.x, 8);
  // words were emitted in reverse symbol order; decoder needs them in
  // reverse emission order.
  uint8_t* q = out + 8;
  for (size_t i = words.size(); i-- > 0;) {
    std::memcpy(q, &words[i], 4);
    q += 4;
  }
  return total;
}

struct LbicRansDecoder {
  Reader reader;
  std::vector<uint8_t> data;
};

void* lbic_rans_decoder_new(const uint8_t* stream, int64_t len) {
  auto* d = new LbicRansDecoder();
  d->data.assign(stream, stream + len);
  if (!d->reader.init(d->data.data(), len)) {
    delete d;
    return nullptr;
  }
  return d;
}

void lbic_rans_decoder_free(void* dec) {
  delete static_cast<LbicRansDecoder*>(dec);
}

// Decode n symbols with the given cdf-row indexes (incremental; call
// repeatedly on the same decoder to consume the stream wavefront-step by
// wavefront-step). Writes raw symbol integers to out_symbols. Returns 0 on
// success, -2 on bad input.
int32_t lbic_rans_decode_stream(void* dec, const int32_t* indexes, int64_t n,
                                const int32_t* cdfs, int32_t n_rows,
                                int32_t stride, const int32_t* cdf_lengths,
                                const int32_t* offsets, int32_t* out_symbols) {
  auto* d = static_cast<LbicRansDecoder*>(dec);
  for (int64_t i = 0; i < n; ++i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_rows) return -2;
    const int32_t* row = cdfs + static_cast<int64_t>(idx) * stride;
    int32_t cdf_len = cdf_lengths[idx];
    int32_t max_value = cdf_len - 2;
    uint32_t s = d->reader.get(row, cdf_len - 1 + 1);
    int64_t value;
    if (static_cast<int32_t>(s) == max_value) {
      uint32_t z = 0;
      for (int c = 0; c < kBypassChunks; ++c) {
        z |= d->reader.get_bits(kBypassBits) << (c * kBypassBits);
      }
      int64_t raw = unzigzag(z);
      value = raw >= 0 ? raw + max_value : raw;
    } else {
      value = static_cast<int64_t>(s);
    }
    out_symbols[i] = static_cast<int32_t>(value + offsets[idx]);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// rans32: lane-interleaved 32-bit-state / 16-bit-renorm streams, decodable on
// the TPU (see coding/rans32.py for the format spec and
// engine/device_rans.py for the device decoder). This is the production
// encoder: symbol (step d, lane i, channel m) -> stream (i, m % G); each
// stream is a standard rANS encoded in reverse with halfword renorm.
// ---------------------------------------------------------------------------

namespace {

constexpr uint32_t kRans32L = 1u << 16;

struct Enc32 {
  uint32_t x = kRans32L;
  std::vector<uint16_t> out;  // reverse emission order

  inline void put(uint32_t start, uint32_t freq) {
    uint32_t x_max = freq << 16;
    while (x >= x_max) {
      out.push_back(static_cast<uint16_t>(x & 0xFFFF));
      x >>= 16;
    }
    x = ((x / freq) << kPrecision) + (x % freq) + start;
  }

  inline void put_bits(uint32_t bits, int nbits) {
    uint32_t x_max = (kRans32L >> nbits) << 16;
    while (x >= x_max) {
      out.push_back(static_cast<uint16_t>(x & 0xFFFF));
      x >>= 16;
    }
    x = (x << nbits) | (bits & ((1u << nbits) - 1));
  }
};

}  // namespace

// Encode wavefront-ordered symbols into the rans32 interleaved format.
// symbols/indexes: (steps, Dmax, M) row-major; valid: (steps*Dmax) uint8.
// Returns bytes written, -1 if out_capacity too small, -2 on bad input.
int64_t lbic_rans32_encode_interleaved(
    const int32_t* symbols, const int32_t* indexes, const uint8_t* valid,
    int32_t steps, int32_t Dmax, int32_t M, int32_t G, const int32_t* cdfs,
    int32_t n_rows, int32_t stride, const int32_t* cdf_lengths,
    const int32_t* offsets, uint8_t* out, int64_t out_capacity) {
  if (G <= 0 || M % G != 0) return -2;
  const int64_t n_lanes = static_cast<int64_t>(Dmax) * G;
  // gather each lane's (symbol, index) sequence in decode order
  std::vector<std::vector<int32_t>> lane_sym(n_lanes), lane_idx(n_lanes);
  for (int64_t d = 0; d < steps; ++d) {
    for (int64_t i = 0; i < Dmax; ++i) {
      if (!valid[d * Dmax + i]) continue;
      const int64_t base = (d * Dmax + i) * M;
      for (int64_t m = 0; m < M; ++m) {
        const int64_t ln = i * G + (m % G);
        lane_sym[ln].push_back(symbols[base + m]);
        lane_idx[ln].push_back(indexes[base + m]);
      }
    }
  }
  // encode every lane (reverse), then assemble header + payload
  std::vector<std::vector<uint16_t>> streams(n_lanes);
  for (int64_t ln = 0; ln < n_lanes; ++ln) {
    Enc32 e;
    const auto& sy = lane_sym[ln];
    const auto& ix = lane_idx[ln];
    for (int64_t i = static_cast<int64_t>(sy.size()) - 1; i >= 0; --i) {
      int32_t idx = ix[i];
      if (idx < 0 || idx >= n_rows) return -2;
      const int32_t* row = cdfs + static_cast<int64_t>(idx) * stride;
      int32_t cdf_len = cdf_lengths[idx];
      int32_t max_value = cdf_len - 2;
      int64_t value = static_cast<int64_t>(sy[i]) - offsets[idx];
      if (value >= 0 && value < max_value) {
        e.put(static_cast<uint32_t>(row[value]),
              static_cast<uint32_t>(row[value + 1] - row[value]));
      } else {
        uint32_t z = zigzag(value >= max_value ? value - max_value : value);
        for (int c = kBypassChunks - 1; c >= 0; --c) {
          e.put_bits(z >> (c * kBypassBits), kBypassBits);
        }
        e.put(static_cast<uint32_t>(row[max_value]),
              static_cast<uint32_t>(row[max_value + 1] - row[max_value]));
      }
    }
    auto& s = streams[ln];
    s.push_back(static_cast<uint16_t>(e.x & 0xFFFF));
    s.push_back(static_cast<uint16_t>(e.x >> 16));
    for (size_t k = e.out.size(); k-- > 0;) s.push_back(e.out[k]);
  }
  int64_t payload_hw = 0;
  for (const auto& s : streams) {
    if (s.size() > 0xFFFF) return -3;  // uint16 header limit: raise G
    payload_hw += static_cast<int64_t>(s.size());
  }
  if (n_lanes > 0xFFFF) return -3;
  int64_t total = 2 + 2 * n_lanes + 2 * payload_hw;
  if (total > out_capacity) return -1;
  uint8_t* q = out;
  uint16_t nl16 = static_cast<uint16_t>(n_lanes);
  std::memcpy(q, &nl16, 2);
  q += 2;
  for (const auto& s : streams) {
    uint16_t len = static_cast<uint16_t>(s.size());
    std::memcpy(q, &len, 2);
    q += 2;
  }
  for (const auto& s : streams) {
    std::memcpy(q, s.data(), s.size() * 2);
    q += s.size() * 2;
  }
  return total;
}

// PMF -> quantized CDF (same algorithm as coding/cdf.py, for parity tests
// and for callers that want to stay in C++). Writes n+1 entries to out_cdf.
int32_t lbic_pmf_to_quantized_cdf(const double* pmf, int32_t n,
                                  int32_t precision, int32_t* out_cdf) {
  const int64_t total = 1ll << precision;
  std::vector<int64_t> freqs(n);
  int64_t s = 0;
  for (int i = 0; i < n; ++i) {
    double p = pmf[i];
    if (!(p >= 0)) return -2;
    freqs[i] = static_cast<int64_t>(p * total + 0.5);
    s += freqs[i];
  }
  if (s == 0) {
    for (int i = 0; i < n; ++i) freqs[i] = 1;
    s = n;
  }
  std::vector<int64_t> cdf(n + 1, 0);
  for (int i = 0; i < n; ++i) {
    freqs[i] = static_cast<int64_t>(
        static_cast<uint64_t>(freqs[i]) * static_cast<uint64_t>(total) /
        static_cast<uint64_t>(s));
    cdf[i + 1] = cdf[i] + freqs[i];
  }
  cdf[n] = total;
  for (int i = 0; i < n; ++i) {
    while (cdf[i + 1] <= cdf[i]) {
      // steal from widest interval
      int64_t best_w = -1;
      int best_j = -1;
      for (int j = 0; j < n; ++j) {
        int64_t w = cdf[j + 1] - cdf[j];
        if (w > best_w) {
          best_w = w;
          best_j = j;
        }
      }
      if (best_w <= 1) return -3;
      if (best_j >= i + 1) {
        for (int k = i + 1; k <= best_j; ++k) cdf[k] += 1;
      } else {
        for (int k = best_j + 1; k <= i; ++k) cdf[k] -= 1;
      }
    }
  }
  for (int i = 0; i <= n; ++i) out_cdf[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

}  // extern "C"
