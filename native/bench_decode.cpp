// Micro-benchmark for the chunk decode hot path: phase timers over a real
// column chunk dumped to a file (see scripts usage in docs/PERFORMANCE.md).
// Build: g++ -O2 -std=c++17 -o /tmp/bench_decode bench_decode.cpp -lzstd -lz
// Run:   /tmp/bench_decode /tmp/rg0_chunk.bin <max_def> <max_rep> <rows> <nvals>
#include "pqvector_pages.cpp"

#include <chrono>
#include <cstdio>
#include <fstream>

using clk = std::chrono::steady_clock;
static double ms(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double, std::milli>(b - a).count();
}

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr, "usage: %s chunk.bin max_def max_rep rows nvals\n",
                 argv[0]);
    return 2;
  }
  std::ifstream in(argv[1], std::ios::binary);
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(in)),
                           std::istreambuf_iterator<char>());
  int32_t max_def = std::atoi(argv[2]);
  int32_t max_rep = std::atoi(argv[3]);
  int64_t rows = std::atoll(argv[4]);
  int64_t nvals = std::atoll(argv[5]);
  std::printf("chunk %zu bytes, rows=%lld nvals=%lld\n", buf.size(),
              (long long)rows, (long long)nvals);

  // Phase A: header walk only.
  {
    auto t0 = clk::now();
    size_t pos = 0;
    int pages = 0, dict_pages = 0;
    int64_t dict_comp = 0, plain_comp = 0, dictenc_pages = 0;
    while (pos < buf.size()) {
      PageHeader h;
      if (!parse_page_header(buf.data() + pos, buf.size() - pos, h)) {
        std::printf("header parse fail at %zu\n", pos);
        return 1;
      }
      if (h.page_type == 2) {
        ++dict_pages;
        dict_comp += h.compressed_size;
      } else {
        ++pages;
        if (h.encoding == 2 || h.encoding == 8) {
          ++dictenc_pages;
        }
        plain_comp += h.compressed_size;
      }
      pos += h.header_len + h.compressed_size;
    }
    auto t1 = clk::now();
    std::printf(
        "headers: %.1f ms (%d data pages, %d dict pages, %lld dict-enc "
        "pages, %lld MB data)\n",
        ms(t0, t1), pages, dict_pages, (long long)dictenc_pages,
        (long long)(plain_comp >> 20));
  }

  // Phase B: header walk + snappy decompress of every page body.
  {
    auto t0 = clk::now();
    size_t pos = 0;
    std::vector<uint8_t> scratch;
    int64_t total = 0;
    while (pos < buf.size()) {
      PageHeader h;
      parse_page_header(buf.data() + pos, buf.size() - pos, h);
      scratch.resize(h.uncompressed_size);
      size_t got = 0;
      int rc = snappy_decompress(buf.data() + pos + h.header_len,
                                 h.compressed_size, scratch.data(),
                                 scratch.size(), &got);
      if (rc) {
        std::printf("snappy fail %d at %zu\n", rc, pos);
        return 1;
      }
      total += got;
      pos += h.header_len + h.compressed_size;
    }
    auto t1 = clk::now();
    std::printf("headers+snappy: %.1f ms (%lld MB out -> %.0f MB/s)\n",
                ms(t0, t1), (long long)(total >> 20),
                (total / 1048576.0) / (ms(t0, t1) / 1000.0));
  }

  // Phase C: full decode (what pqv_decode_chunk does today).
  {
    std::vector<float> out((size_t)nvals);
    std::vector<int64_t> lens((size_t)rows);
    int64_t out_nv = 0;
    auto t0 = clk::now();
    int64_t r = pqv_decode_chunk(buf.data(), buf.size(), "snappy", 4, max_def,
                                 max_rep, out.data(), out.size(), lens.data(),
                                 lens.size(), &out_nv);
    auto t1 = clk::now();
    std::printf("full decode: %.1f ms rows=%lld nv=%lld (%.0f MB/s values)\n",
                ms(t0, t1), (long long)r, (long long)out_nv,
                (out_nv * 4.0 / 1048576.0) / (ms(t0, t1) / 1000.0));
  }
  return 0;
}
