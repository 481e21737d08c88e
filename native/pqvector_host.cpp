// pqvector-tpu native host library: Parquet footer surgery.
//
// C++ counterpart of pqvector_tpu/io/thrift.py + io/embed.py (components
// #6/#8 in SURVEY.md §2; reference behavior at
// /root/reference/src/ivf/parquet.rs:536-611). The Python implementation is
// the portable fallback and test oracle; this library is the production path
// for large footers and is loaded via ctypes (see pqvector_tpu/io/native.py).
//
// Exposed C API:
//   pqv_splice_kv   — rewrite FileMetaData.key_value_metadata (field 5) in a
//                     Thrift compact-protocol buffer, copying all other
//                     fields byte-for-byte (deltas recomputed).
//   pqv_append_index_inplace — full in-place embed: read footer tail, splice
//                     KV pairs, write payload + new metadata + footer.
//
// Build: make -C native   (produces libpqvector_host.so)

#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

constexpr uint8_t CT_STOP = 0x0;
constexpr uint8_t CT_BINARY = 0x8;
constexpr uint8_t CT_LIST = 0x9;
constexpr uint8_t CT_SET = 0xA;
constexpr uint8_t CT_MAP = 0xB;
constexpr uint8_t CT_STRUCT = 0xC;

constexpr int KV_FIELD_ID = 5;

constexpr int ERR_TRUNCATED = -1;
constexpr int ERR_MALFORMED = -2;
constexpr int ERR_CAPACITY = -3;
constexpr int ERR_IO = -4;
constexpr int ERR_ENCRYPTED = -5;
constexpr int ERR_NOT_PARQUET = -6;

struct Reader {
  const uint8_t* buf;
  size_t len;
  size_t pos = 0;
  bool ok = true;

  uint8_t u8() {
    if (pos >= len) {
      ok = false;
      return 0;
    }
    return buf[pos++];
  }

  uint64_t varint() {
    uint64_t result = 0;
    int shift = 0;
    while (true) {
      if (pos >= len || shift > 70) {
        ok = false;
        return 0;
      }
      uint8_t b = buf[pos++];
      result |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return result;
      shift += 7;
    }
  }

  int64_t zigzag() {
    uint64_t v = varint();
    return static_cast<int64_t>(v >> 1) ^ -static_cast<int64_t>(v & 1);
  }

  void skip_bytes(size_t n) {
    if (pos + n > len) {
      ok = false;
      return;
    }
    pos += n;
  }
};

void write_varint(std::string& out, uint64_t value) {
  while (true) {
    uint8_t b = value & 0x7F;
    value >>= 7;
    if (value) {
      out.push_back(static_cast<char>(b | 0x80));
    } else {
      out.push_back(static_cast<char>(b));
      return;
    }
  }
}

uint64_t zigzag_encode(int64_t value) {
  return (static_cast<uint64_t>(value) << 1) ^
         static_cast<uint64_t>(value >> 63);
}

void skip_value(Reader& r, uint8_t ctype);

void skip_struct(Reader& r) {
  while (r.ok) {
    uint8_t header = r.u8();
    if (header == CT_STOP) return;
    uint8_t ctype = header & 0x0F;
    uint8_t delta = header >> 4;
    if (!delta) r.zigzag();
    skip_value(r, ctype);
  }
}

void skip_value(Reader& r, uint8_t ctype) {
  switch (ctype) {
    case 0x1:  // bool true (value in header)
    case 0x2:  // bool false
      return;
    case 0x3:  // byte
      r.skip_bytes(1);
      return;
    case 0x4:  // i16
    case 0x5:  // i32
    case 0x6:  // i64
      r.varint();
      return;
    case 0x7:  // double
      r.skip_bytes(8);
      return;
    case CT_BINARY: {
      uint64_t n = r.varint();
      r.skip_bytes(n);
      return;
    }
    case CT_LIST:
    case CT_SET: {
      uint8_t header = r.u8();
      uint8_t elem = header & 0x0F;
      uint64_t size = header >> 4;
      if (size == 15) size = r.varint();
      if (elem == 0x1 || elem == 0x2) {
        r.skip_bytes(size);
        return;
      }
      for (uint64_t i = 0; i < size && r.ok; ++i) skip_value(r, elem);
      return;
    }
    case CT_MAP: {
      uint64_t size = r.varint();
      if (!size) return;
      uint8_t kv = r.u8();
      uint8_t kt = kv >> 4, vt = kv & 0x0F;
      for (uint64_t i = 0; i < size && r.ok; ++i) {
        skip_value(r, kt);
        skip_value(r, vt);
      }
      return;
    }
    case CT_STRUCT:
      skip_struct(r);
      return;
    default:
      r.ok = false;
  }
}

struct Field {
  int64_t id;
  uint8_t ctype;
  size_t body_start;
  size_t body_end;
};

bool parse_top_fields(const uint8_t* buf, size_t len, std::vector<Field>& out,
                      size_t& stop_pos) {
  Reader r{buf, len};
  int64_t last_id = 0;
  while (true) {
    uint8_t header = r.u8();
    if (!r.ok) return false;
    if (header == CT_STOP) {
      stop_pos = r.pos;
      return true;
    }
    uint8_t ctype = header & 0x0F;
    uint8_t delta = header >> 4;
    if (delta) {
      last_id += delta;
    } else {
      last_id = r.zigzag();
    }
    size_t body_start = r.pos;
    skip_value(r, ctype);
    if (!r.ok) return false;
    out.push_back({last_id, ctype, body_start, r.pos});
  }
}

struct KeyValue {
  std::string key;
  std::string value;
  bool has_value;
};

bool decode_kv_list(const uint8_t* buf, size_t len, size_t pos,
                    std::vector<KeyValue>& out) {
  Reader r{buf, len, pos};
  uint8_t header = r.u8();
  uint8_t elem = header & 0x0F;
  uint64_t size = header >> 4;
  if (size == 15) size = r.varint();
  if (elem != CT_STRUCT || !r.ok) return false;
  for (uint64_t i = 0; i < size; ++i) {
    KeyValue kv{"", "", false};
    bool has_key = false;
    int64_t last_id = 0;
    while (true) {
      uint8_t h = r.u8();
      if (!r.ok) return false;
      if (h == CT_STOP) break;
      uint8_t ct = h & 0x0F;
      uint8_t delta = h >> 4;
      if (delta) {
        last_id += delta;
      } else {
        last_id = r.zigzag();
      }
      if (ct == CT_BINARY && (last_id == 1 || last_id == 2)) {
        uint64_t n = r.varint();
        if (r.pos + n > r.len) return false;
        std::string s(reinterpret_cast<const char*>(r.buf + r.pos), n);
        r.pos += n;
        if (last_id == 1) {
          kv.key = std::move(s);
          has_key = true;
        } else {
          kv.value = std::move(s);
          kv.has_value = true;
        }
      } else {
        skip_value(r, ct);
        if (!r.ok) return false;
      }
    }
    if (!has_key) return false;
    out.push_back(std::move(kv));
  }
  return true;
}

void encode_kv_list(std::string& out, const std::vector<KeyValue>& pairs) {
  size_t size = pairs.size();
  if (size < 15) {
    out.push_back(static_cast<char>((size << 4) | CT_STRUCT));
  } else {
    out.push_back(static_cast<char>(0xF0 | CT_STRUCT));
    write_varint(out, size);
  }
  for (const auto& kv : pairs) {
    out.push_back(static_cast<char>((1 << 4) | CT_BINARY));  // field 1
    write_varint(out, kv.key.size());
    out += kv.key;
    if (kv.has_value) {
      out.push_back(static_cast<char>((1 << 4) | CT_BINARY));  // field 2
      write_varint(out, kv.value.size());
      out += kv.value;
    }
    out.push_back(static_cast<char>(CT_STOP));
  }
}

void write_field_header(std::string& out, int64_t prev_id, int64_t field_id,
                        uint8_t ctype) {
  int64_t delta = field_id - prev_id;
  if (delta >= 1 && delta <= 15) {
    out.push_back(static_cast<char>((delta << 4) | ctype));
  } else {
    out.push_back(static_cast<char>(ctype));
    write_varint(out, zigzag_encode(field_id));
  }
}

// Core splice: returns 0 on success, negative error otherwise.
int splice(const uint8_t* meta, size_t meta_len,
           const char* const* set_keys, const char* const* set_vals,
           size_t n_set, const char* const* drop_keys, size_t n_drop,
           std::string& out) {
  std::vector<Field> fields;
  size_t stop_pos = 0;
  if (!parse_top_fields(meta, meta_len, fields, stop_pos)) return ERR_MALFORMED;

  std::vector<KeyValue> existing;
  for (const auto& f : fields) {
    if (f.id == KV_FIELD_ID && f.ctype == CT_LIST) {
      if (!decode_kv_list(meta, meta_len, f.body_start, existing))
        return ERR_MALFORMED;
      break;
    }
  }

  std::vector<KeyValue> pairs;
  for (auto& kv : existing) {
    bool dropped = false;
    for (size_t i = 0; i < n_drop; ++i) {
      if (kv.key == drop_keys[i]) {
        dropped = true;
        break;
      }
    }
    if (!dropped) pairs.push_back(std::move(kv));
  }
  for (size_t i = 0; i < n_set; ++i) {
    pairs.push_back({set_keys[i], set_vals[i], true});
  }

  std::string kv_body;
  encode_kv_list(kv_body, pairs);

  out.clear();
  out.reserve(meta_len + kv_body.size() + 16);
  int64_t prev_id = 0;
  bool emitted = false;
  for (const auto& f : fields) {
    if (f.id == KV_FIELD_ID) {
      write_field_header(out, prev_id, KV_FIELD_ID, CT_LIST);
      out += kv_body;
      prev_id = KV_FIELD_ID;
      emitted = true;
      continue;
    }
    if (f.id > KV_FIELD_ID && !emitted) {
      write_field_header(out, prev_id, KV_FIELD_ID, CT_LIST);
      out += kv_body;
      prev_id = KV_FIELD_ID;
      emitted = true;
    }
    write_field_header(out, prev_id, f.id, f.ctype);
    out.append(reinterpret_cast<const char*>(meta + f.body_start),
               f.body_end - f.body_start);
    prev_id = f.id;
  }
  if (!emitted) {
    write_field_header(out, prev_id, KV_FIELD_ID, CT_LIST);
    out += kv_body;
  }
  out.push_back(static_cast<char>(CT_STOP));
  out.append(reinterpret_cast<const char*>(meta + stop_pos),
             meta_len - stop_pos);
  return 0;
}

}  // namespace

extern "C" {

// Splice KV metadata. Returns the size of the new metadata, or a negative
// error. If out_cap is too small, returns the required size without writing
// (call once with out=nullptr/out_cap=0 to size, then again).
int64_t pqv_splice_kv(const uint8_t* meta, size_t meta_len,
                      const char* const* set_keys, const char* const* set_vals,
                      size_t n_set, const char* const* drop_keys,
                      size_t n_drop, uint8_t* out, size_t out_cap) {
  std::string result;
  int rc = splice(meta, meta_len, set_keys, set_vals, n_set, drop_keys, n_drop,
                  result);
  if (rc != 0) return rc;
  if (out != nullptr && result.size() <= out_cap) {
    std::memcpy(out, result.data(), result.size());
  }
  return static_cast<int64_t>(result.size());
}

// Full in-place index embed (reference algorithm, parquet.rs:542-611):
// payload (magic + u64 LE len + index bytes) written at file_len-8, spliced
// metadata + fresh footer tail after it. Returns 0 on success.
int pqv_append_index_inplace(const char* path, const uint8_t* index_bytes,
                             uint64_t index_len, const char* column,
                             const char* offset_key, const char* column_key,
                             const char* magic, size_t magic_len,
                             const char* const* extra_keys,
                             const char* const* extra_vals, size_t n_extra,
                             const char* const* extra_drop_keys,
                             size_t n_extra_drop) {
  FILE* f = std::fopen(path, "r+b");
  if (!f) return ERR_IO;

  int rc = 0;
  do {
    if (std::fseek(f, 0, SEEK_END) != 0) {
      rc = ERR_IO;
      break;
    }
    long file_len = std::ftell(f);
    if (file_len < 8) {
      rc = ERR_NOT_PARQUET;
      break;
    }
    uint8_t tail[8];
    if (std::fseek(f, file_len - 8, SEEK_SET) != 0 ||
        std::fread(tail, 1, 8, f) != 8) {
      rc = ERR_IO;
      break;
    }
    if (std::memcmp(tail + 4, "PARE", 4) == 0) {
      rc = ERR_ENCRYPTED;
      break;
    }
    if (std::memcmp(tail + 4, "PAR1", 4) != 0) {
      rc = ERR_NOT_PARQUET;
      break;
    }
    uint32_t meta_len = static_cast<uint32_t>(tail[0]) |
                        (static_cast<uint32_t>(tail[1]) << 8) |
                        (static_cast<uint32_t>(tail[2]) << 16) |
                        (static_cast<uint32_t>(tail[3]) << 24);
    if (static_cast<long>(meta_len) + 8 > file_len) {
      rc = ERR_MALFORMED;
      break;
    }
    std::vector<uint8_t> meta(meta_len);
    if (std::fseek(f, file_len - 8 - static_cast<long>(meta_len), SEEK_SET) !=
            0 ||
        std::fread(meta.data(), 1, meta_len, f) != meta_len) {
      rc = ERR_IO;
      break;
    }

    uint64_t index_offset = static_cast<uint64_t>(file_len) - 8;
    char offset_str[32];
    std::snprintf(offset_str, sizeof(offset_str), "%llu",
                  static_cast<unsigned long long>(index_offset));

    std::vector<const char*> set_keys = {offset_key, column_key};
    std::vector<const char*> set_vals = {offset_str, column};
    std::vector<const char*> drop_keys = {offset_key, column_key};
    for (size_t i = 0; i < n_extra; ++i) {
      set_keys.push_back(extra_keys[i]);
      set_vals.push_back(extra_vals[i]);
      drop_keys.push_back(extra_keys[i]);
    }
    // Keys from previous index appends that this append does not set (e.g.
    // a stale pq_vector_metric after a rebuild with a different metric)
    // must still be stripped.
    for (size_t i = 0; i < n_extra_drop; ++i)
      drop_keys.push_back(extra_drop_keys[i]);
    std::string new_meta;
    int src = splice(meta.data(), meta.size(), set_keys.data(),
                     set_vals.data(), set_keys.size(), drop_keys.data(),
                     drop_keys.size(), new_meta);
    if (src != 0) {
      rc = src;
      break;
    }

    if (std::fseek(f, static_cast<long>(index_offset), SEEK_SET) != 0) {
      rc = ERR_IO;
      break;
    }
    uint8_t len_le[8];
    for (int i = 0; i < 8; ++i)
      len_le[i] = static_cast<uint8_t>((index_len >> (8 * i)) & 0xFF);
    if (std::fwrite(magic, 1, magic_len, f) != magic_len ||
        std::fwrite(len_le, 1, 8, f) != 8 ||
        std::fwrite(index_bytes, 1, index_len, f) != index_len ||
        std::fwrite(new_meta.data(), 1, new_meta.size(), f) !=
            new_meta.size()) {
      rc = ERR_IO;
      break;
    }
    // Ordered durability: payload + metadata land before the footer tail
    // that references them (mirrors the Python path).
    std::fflush(f);
    ::fsync(::fileno(f));
    uint32_t nm_len = static_cast<uint32_t>(new_meta.size());
    uint8_t footer[8] = {static_cast<uint8_t>(nm_len & 0xFF),
                         static_cast<uint8_t>((nm_len >> 8) & 0xFF),
                         static_cast<uint8_t>((nm_len >> 16) & 0xFF),
                         static_cast<uint8_t>((nm_len >> 24) & 0xFF),
                         'P', 'A', 'R', '1'};
    if (std::fwrite(footer, 1, 8, f) != 8) {
      rc = ERR_IO;
      break;
    }
    long end_pos = std::ftell(f);
    std::fflush(f);
    // Drop any trailing bytes from a previous (larger) footer region.
    if (end_pos > 0 && ::ftruncate(::fileno(f), end_pos) != 0) {
      rc = ERR_IO;
      break;
    }
    ::fsync(::fileno(f));
  } while (false);

  std::fclose(f);
  return rc;
}

// Symmetric per-row int8 wire quantization for the build transfer
// (index/build.py:_encode_int8). Bit-identical to the numpy oracle:
// scale = float32(float64(rowmax)/127.0); codes = clip(rint(x/scale)).
// IEEE f32 division + rint (round-half-even, the default FP mode) match
// numpy exactly, so staged/unstaged and native/python builds agree.
// Runs without the GIL (ctypes releases it) — the point: the in-session
// numpy encode cost 29 s of GIL-contended host time (session r4k).
int pqv_quantize_i8(const float* in, int64_t n, int64_t d, int8_t* codes,
                    float* scales) {
  if (n < 0 || d <= 0 || !in || !codes || !scales) return -2;
  for (int64_t i = 0; i < n; ++i) {
    const float* row = in + i * d;
    float m = 0.0f;
    for (int64_t j = 0; j < d; ++j) {
      float a = __builtin_fabsf(row[j]);
      if (a > m) m = a;
    }
    const float s =
        m > 0.0f ? static_cast<float>(static_cast<double>(m) / 127.0) : 1.0f;
    scales[i] = s;
    int8_t* out = codes + i * d;
    for (int64_t j = 0; j < d; ++j) {
      float v = __builtin_rintf(row[j] / s);
      if (v > 127.0f) v = 127.0f;
      if (v < -127.0f) v = -127.0f;
      out[j] = static_cast<int8_t>(v);
    }
  }
  return 0;
}

// f32 -> bfloat16 cast with round-to-nearest-even, bit-identical to
// ml_dtypes (numpy .astype(bfloat16) holds the GIL through its cast
// loop; this runs GIL-released inside the threaded build transfer).
// NaN quiets to (hi | 0x0040) so a payload NaN never rounds into Inf.
int pqv_cast_bf16(const float* in, int64_t count, uint16_t* out) {
  if (count < 0 || !in || !out) return -2;
  for (int64_t i = 0; i < count; ++i) {
    uint32_t bits;
    std::memcpy(&bits, &in[i], 4);
    if ((bits & 0x7FFFFFFFu) > 0x7F800000u) {  // NaN
      out[i] = static_cast<uint16_t>((bits >> 16) | 0x0040u);
      continue;
    }
    const uint32_t rounding_bias = 0x7FFFu + ((bits >> 16) & 1u);
    out[i] = static_cast<uint16_t>((bits + rounding_bias) >> 16);
  }
  return 0;
}

// Nearest-centroid selection epilogue for the HOST assignment pass
// (index/build.py:_assign_clusters_host): given scores[i][j] = x_i . c_j
// (BLAS sgemm on the Python side) and bias[j] = |c_j|^2, pick
// argmin_j (bias[j] - 2*scores[i][j]) with first-min tie-break — the
// same reduced L2 form and tie order as the device kernel
// (index/kmeans.py:_assign_blocks; the |x|^2 term cannot change the
// argmin). numpy's argmin over the [n,k] temp measured 2.2 s per 64k
// chunk on this host; this loop is memory-bound (~0.05 s).
int pqv_assign_argmin(const float* scores, int64_t n, int64_t k,
                      const float* bias, int32_t* out) {
  if (n < 0 || k <= 0 || !scores || !bias || !out) return -2;
  for (int64_t i = 0; i < n; ++i) {
    const float* row = scores + i * k;
    float best = bias[0] - 2.0f * row[0];
    int32_t arg = 0;
    for (int64_t j = 1; j < k; ++j) {
      float v = bias[j] - 2.0f * row[j];
      if (v < best) {
        best = v;
        arg = static_cast<int32_t>(j);
      }
    }
    out[i] = arg;
  }
  return 0;
}

// Selection epilogue for the CERTIFIED bf16 host assignment
// (index/build.py:_assign_clusters_host gemm="bf16"): one pass over the
// bf16 score block straight out of the AMX matmul — no f32 expansion,
// no [n,k] temps. Per row i over scores[i][j] = bf16(x_i . c_j):
//   red_j = bias[j] - 2*f32(scores[i][j])
//   idx[i]  = argmin_j red_j          (first-min tie-break, same as
//                                      pqv_assign_argmin / numpy)
//   amb[i]  = (secondmin - min) <= env[i]
// Ambiguous rows fall inside the bf16 rounding envelope and get an
// exact f32 re-score on the Python side, making the partition equal
// the f32 sgemm's. The two-min tracking is vectorized (AVX-512 when
// available: 16-lane min1/min2/argidx with a scalar horizontal merge —
// the scalar loop's 2-min dependency chain runs ~3.5 cycles/element,
// ~1.7 s per reference-default assignment; the vector form is
// memory-bound).
#if defined(__AVX512F__)
#include <immintrin.h>
#endif

static inline float pqv_bf16_to_f32(uint16_t h) {
  uint32_t bits = static_cast<uint32_t>(h) << 16;
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

int pqv_assign_margin_bf16(const uint16_t* scores, int64_t n, int64_t k,
                           const float* bias, const float* env,
                           int32_t* idx_out, uint8_t* amb_out) {
  if (n < 0 || k <= 0 || !scores || !bias || !env || !idx_out || !amb_out)
    return -2;
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t* row = scores + i * k;
    float m1 = std::numeric_limits<float>::infinity();
    float m2 = m1;
    int32_t arg = 0;
    int64_t j = 0;
#if defined(__AVX512F__)
    if (k >= 16) {
      const __m512 inf = _mm512_set1_ps(std::numeric_limits<float>::infinity());
      __m512 vm1 = inf, vm2 = inf;
      __m512i vidx = _mm512_setzero_si512();
      for (; j + 16 <= k; j += 16) {
        __m256i h = _mm256_loadu_si256(
            reinterpret_cast<const __m256i*>(row + j));
        __m512i w = _mm512_slli_epi32(_mm512_cvtepu16_epi32(h), 16);
        __m512 s = _mm512_castsi512_ps(w);
        __m512 red = _mm512_fnmadd_ps(
            _mm512_set1_ps(2.0f), s, _mm512_loadu_ps(bias + j));
        __mmask16 lt1 = _mm512_cmp_ps_mask(red, vm1, _CMP_LT_OQ);
        // new second-min candidate: old m1 where red takes over, red else
        __m512 cand2 = _mm512_mask_blend_ps(lt1, red, vm1);
        vm2 = _mm512_min_ps(vm2, cand2);
        vm1 = _mm512_mask_mov_ps(vm1, lt1, red);
        vidx = _mm512_mask_mov_epi32(
            vidx, lt1, _mm512_set1_epi32(static_cast<int32_t>(j)));
      }
      // Horizontal merge: lane l of vm1 holds the lane min with the
      // FIRST base index j where it was set; element index = j + l.
      alignas(64) float l1[16], l2[16];
      alignas(64) int32_t li[16];
      _mm512_store_ps(l1, vm1);
      _mm512_store_ps(l2, vm2);
      _mm512_store_si512(reinterpret_cast<__m512i*>(li), vidx);
      for (int l = 0; l < 16; ++l) {
        float v = l1[l];
        int32_t ei = li[l] + l;
        if (v < m1) {
          m2 = m1;
          m1 = v;
          arg = ei;
        } else if (v == m1 && ei < arg) {
          m2 = m1;  // duplicate of the min elsewhere: margin is 0 anyway
          arg = ei;
        } else if (v < m2) {
          m2 = v;
        }
        if (l2[l] < m2) m2 = l2[l];
      }
    }
#endif
    for (; j < k; ++j) {
      float v = bias[j] - 2.0f * pqv_bf16_to_f32(row[j]);
      if (v < m1) {
        m2 = m1;
        m1 = v;
        arg = static_cast<int32_t>(j);
      } else if (v < m2) {
        m2 = v;
      }
    }
    idx_out[i] = arg;
    amb_out[i] = (m2 - m1) <= env[i] ? 1 : 0;
  }
  return 0;
}

const char* pqv_version() { return "pqvector-host 0.1.0"; }

}  // extern "C"
