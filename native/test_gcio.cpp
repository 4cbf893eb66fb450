// Standalone exerciser for the threaded native core, built with
// -fsanitize=thread (make tsan) so the BGZF inflate/deflate workers, row
// gathers and nibble packers run under TSan in CI (SURVEY.md §5: the
// reference has no threads; our host pipeline does, so we sanitize it).
//
// Usage: test_gcio <tmpdir>   — exits non-zero on any failure; TSan
// reports (if any) go to stderr and fail the wrapper test.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
uint8_t* gc_bgzf_read(const char* path, int64_t* out_len, int n_threads);
int gc_bgzf_write(const char* path, const uint8_t* payload, int64_t len,
                  int level, int n_threads);
int gc_bgzf_write_ex(const char* path, const uint8_t* payload, int64_t len,
                     int level, int n_threads, int append, int write_eof);
int gc_bgzf_read_blocks(const char* path, int64_t block_lo, int64_t block_hi,
                        uint8_t* out, int64_t out_cap, int n_threads);
int64_t gc_bgzf_block_table(const char* path, int64_t* table, int64_t cap,
                            int64_t* total_out);
void gc_gather_slices(const uint8_t* src, const int64_t* src_off,
                      const int64_t* src_len, int64_t n, uint8_t* dst,
                      const int64_t* dst_off, int n_threads);
void gc_unpack_seq_rows(const uint8_t* src, const int64_t* src_off,
                        const int32_t* lens, int64_t n, uint8_t* out,
                        int64_t L, int n_threads);
void gc_copy_rows(const uint8_t* src, const int64_t* src_off,
                  const int32_t* lens, int64_t n, uint8_t* out, int64_t L,
                  int n_threads);
void gc_pack_seq_rows(const uint8_t* rows, int64_t L, const int32_t* lens,
                      int64_t n, uint8_t* dst, const int64_t* dst_off,
                      int n_threads);
void gc_pack_nib_rows(const uint8_t* src, const int64_t* src_off,
                      const int32_t* lens, int64_t n, const uint8_t* lut,
                      uint8_t* out, int64_t pw, int n_threads);
void gc_unpack_nib_dense(const uint8_t* src, int64_t n, int64_t pw,
                         const uint8_t* lut, uint8_t* out, int n_threads);
void gc_free(void* p);
}

static uint32_t rng_state = 12345;
static uint32_t rnd() {
  rng_state = rng_state * 1664525u + 1013904223u;
  return rng_state;
}

#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__, __LINE__, \
              #cond);                                                    \
      return 1;                                                          \
    }                                                                    \
  } while (0)

int main(int argc, char** argv) {
  std::string dir = argc > 1 ? argv[1] : "/tmp";
  std::string path = dir + "/tsan_test.bgzf";

  // threaded deflate + inflate round trip (several MB, many blocks)
  std::vector<uint8_t> payload(3 << 20);
  for (auto& b : payload) b = rnd() & 0xFF;
  CHECK(gc_bgzf_write(path.c_str(), payload.data(), payload.size(), 4, 8) == 0);
  int64_t n = 0;
  uint8_t* got = gc_bgzf_read(path.c_str(), &n, 8);
  CHECK(got && n == (int64_t)payload.size());
  CHECK(memcmp(got, payload.data(), n) == 0);
  gc_free(got);

  // block table + ranged decode, concurrent-ish sequential calls
  int64_t table[4096 * 2];
  int64_t total = 0;
  int64_t nb = gc_bgzf_block_table(path.c_str(), table, 4096, &total);
  CHECK(nb > 1 && total == (int64_t)payload.size());
  std::vector<uint8_t> half(total);
  CHECK(gc_bgzf_read_blocks(path.c_str(), 0, nb, half.data(), total, 8) == 0);
  CHECK(memcmp(half.data(), payload.data(), total) == 0);

  // append mode
  CHECK(gc_bgzf_write_ex(path.c_str(), payload.data(), 1000, 4, 8, 0, 0) == 0);
  CHECK(gc_bgzf_write_ex(path.c_str(), payload.data() + 1000, 1000, 4, 8, 1,
                         1) == 0);
  got = gc_bgzf_read(path.c_str(), &n, 8);
  CHECK(got && n == 2000 && memcmp(got, payload.data(), 2000) == 0);
  gc_free(got);

  // row machinery on ragged layouts
  const int64_t R = 5000, L = 151;
  std::vector<int64_t> off(R), dst_off(R);
  std::vector<int32_t> lens(R);
  int64_t pos = 0;
  for (int64_t i = 0; i < R; ++i) {
    lens[i] = 1 + (rnd() % L);
    off[i] = pos;
    pos += lens[i];
  }
  std::vector<uint8_t> src(pos);
  for (auto& b : src) b = rnd() & 0xF;
  std::vector<uint8_t> rows(R * L), rows2(R * L);
  gc_copy_rows(src.data(), off.data(), lens.data(), R, rows.data(), L, 8);
  for (int64_t i = 0; i < 64; ++i) {
    int64_t r = rnd() % R;
    CHECK(rows[r * L] == src[off[r]]);
  }
  gc_unpack_seq_rows(src.data(), off.data(), lens.data(), R, rows2.data(), L,
                     8);
  // pack back and compare the packed bytes
  std::vector<uint8_t> packed(pos);
  int64_t ppos = 0;
  std::vector<int64_t> poff(R);
  for (int64_t i = 0; i < R; ++i) {
    poff[i] = ppos;
    ppos += (lens[i] + 1) / 2;
  }
  packed.resize(ppos);
  gc_pack_seq_rows(rows2.data(), L, lens.data(), R, packed.data(),
                   poff.data(), 8);
  uint8_t lut[16];
  for (int i = 0; i < 16; ++i) lut[i] = (uint8_t)(i * 3);
  std::vector<uint8_t> nib(R * 80), dense(R * 160);
  std::vector<int32_t> lens2(R);
  for (int64_t i = 0; i < R; ++i) lens2[i] = lens[i] > 160 ? 160 : lens[i];
  gc_pack_nib_rows(src.data(), off.data(), lens2.data(), R, lut, nib.data(),
                   80, 8);
  gc_unpack_nib_dense(nib.data(), R, 80, lut, dense.data(), 8);

  // gather_slices
  std::vector<uint8_t> gdst(pos);
  std::vector<int64_t> glen(R);
  int64_t gpos = 0;
  std::vector<int64_t> gdo(R);
  for (int64_t i = 0; i < R; ++i) {
    glen[i] = lens[i];
    gdo[i] = gpos;
    gpos += glen[i];
  }
  gc_gather_slices(src.data(), off.data(), glen.data(), R, gdst.data(),
                   gdo.data(), 8);
  CHECK(memcmp(gdst.data(), src.data(), pos) == 0);

  printf("test_gcio OK\n");
  return 0;
}
