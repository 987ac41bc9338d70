// Parity driver: runs the ACTUAL reference implementation (header-only
// templates included from the reference checkout at build time — no
// reference code lives in this repo) and dumps raw sorted output so
// `scripts/parity_check.py` can compare this framework's results
// byte-for-byte against it.
//
// This converts BASELINE.md target #1 ("bit-identical sorted output vs
// reference `radix`") from proxy-oracle claims into a demonstrated check:
// the reference's `radix_sort` (`radix_sort.hpp:98-115`) and
// `radix_sort_rank` (`radix_sort_rank.hpp:97-112`) are invoked exactly as
// its own experiment CLI does (`radix_experiment.cpp:176-238`), including
// the 64-bit memcpy value-mask mangle (`:188-198`) and the descending-order
// `~kdf` convention (`README.md:566-574`).
//
// Build (see Makefile `parity-driver` target):
//   g++ -O2 -std=gnu++17 -I$REF parity/ref_driver.cpp -o parity/ref_driver
//
// Usage:
//   ref_driver <keyfile> <outfile> <n> <type> <maskhex|-> <fwd|rev> <sort|rank>
//
// Output: for `sort`, the n sorted elements as raw little-endian bytes;
// for `rank`, the stable permutation as n uint32 indices.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "radix_sort.hpp"       // reference generic LSD kernel (via -I)
#include "radix_sort_rank.hpp"  // reference rank kernel (via -I)

// The reference's C LISTING rank sort (`radix_sort_u32_ranks.c:38-110`) —
// the semantically correct rank implementation: later passes read keys
// THROUGH the index indirection. (The generic C++ kernel above reads
// `src[j]` in ORIGINAL order every pass, which breaks stability chaining
// for multi-byte keys — demonstrated by `rankcpp` mode below; see
// PARITY.md "reference rank-kernel bug".) Included with its demo `main`
// renamed so we can drive `radix_sort_u32_index` at scale.
#define main radix_sort_u32_ranks_listing_main
#include "radix_sort_u32_ranks.c"
#undef main

namespace {

template <typename T>
int run(const char *keyfile, const char *outfile, size_t n, uint64_t mask,
        bool have_mask, bool reverse, int rank) {
  FILE *f = std::fopen(keyfile, "rb");
  if (!f) { std::perror("keyfile"); return 2; }
  std::vector<T> src(n), aux(n);
  if (std::fread(src.data(), sizeof(T), n, f) != n) {
    std::fprintf(stderr, "keyfile too small for %zu x %zu bytes\n", n, sizeof(T));
    std::fclose(f);
    return 2;
  }
  std::fclose(f);

  if (have_mask) {
    // the experiment CLI's type-punned mangle (`radix_experiment.cpp:188-198`)
    for (size_t i = 0; i < n; ++i) {
      uint64_t buf = 0;
      std::memcpy(&buf, &src[i], sizeof(T));
      buf &= mask;
      std::memcpy(&src[i], &buf, sizeof(T));
    }
  }

  FILE *out = std::fopen(outfile, "wb");
  if (!out) { std::perror("outfile"); return 2; }
  int rc = 0;
  if (rank == 2) {
    // mode `rankc`: the C listing's correct rank sort (u32 keys only,
    // ascending) — keys wrapped in its `struct sortrec` fixture shape
    if (sizeof(T) != 4) { std::fprintf(stderr, "rankc is u32-only\n"); std::fclose(out); return 2; }
    std::vector<sortrec> recs(n);
    for (size_t i = 0; i < n; ++i) {
      uint32_t k = 0;
      std::memcpy(&k, &src[i], 4);
      recs[i].key = k;
    }
    std::vector<uint32_t> ib(2 * n);
    uint32_t *perm = radix_sort_u32_index(recs.data(), ib.data(), n);
    if (std::fwrite(perm, sizeof(uint32_t), n, out) != n) rc = 2;
  } else if (rank) {
    std::vector<uint32_t> ib(2 * n);
    uint32_t *perm;
    if (reverse) {
      perm = radix_sort_rank(src.data(), ib.data(), n,
                             [](const T &v) {
                               auto k = basic_kdfs::kdf(v);
                               return static_cast<decltype(k)>(~k);  // descending = ~key (README.md:566-574); cast undoes int promotion on narrow types
                             });
    } else {
      perm = radix_sort_rank(src.data(), ib.data(), n);
    }
    if (std::fwrite(perm, sizeof(uint32_t), n, out) != n) rc = 2;
  } else {
    T *sorted;
    if (reverse) {
      sorted = radix_sort(src.data(), aux.data(), n,
                          [](const T &v) {
                               auto k = basic_kdfs::kdf(v);
                               return static_cast<decltype(k)>(~k);  // descending = ~key (README.md:566-574); cast undoes int promotion on narrow types
                             });
    } else {
      sorted = radix_sort(src.data(), aux.data(), n);
    }
    if (std::fwrite(sorted, sizeof(T), n, out) != n) rc = 2;
  }
  std::fclose(out);
  return rc;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc != 8) {
    std::fprintf(stderr,
                 "usage: %s <keyfile> <outfile> <n> <type> <maskhex|-> "
                 "<fwd|rev> <sort|rank|rankc>\n", argv[0]);
    return 2;
  }
  const char *keyfile = argv[1], *outfile = argv[2];
  size_t n = std::strtoull(argv[3], nullptr, 10);
  std::string type = argv[4];
  bool have_mask = std::string(argv[5]) != "-";
  uint64_t mask = have_mask ? std::strtoull(argv[5], nullptr, 16) : ~0ULL;
  bool reverse = std::string(argv[6]) == "rev";
  // rank modes: 1 = generic C++ rank kernel (`radix_sort_rank.hpp` — known
  // multi-byte bug, kept to demonstrate it); 2 = the C listing rank sort
  int rank = std::string(argv[7]) == "rank" ? 1
           : std::string(argv[7]) == "rankc" ? 2 : 0;
  if (rank == 2 && (type != "u32" || reverse)) {
    // the C listing sorts raw u32 ascending only; a sizeof-based guard would
    // wrongly admit f32/i32 (raw-bit order, no KDF) and silently ignore rev
    std::fprintf(stderr, "rankc supports only u32 fwd\n");
    return 2;
  }

  if (type == "u8")  return run<uint8_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "u16") return run<uint16_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "u32") return run<uint32_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "u64") return run<uint64_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "i32") return run<int32_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "i64") return run<int64_t>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "f32") return run<float>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  if (type == "f64") return run<double>(keyfile, outfile, n, mask, have_mask, reverse, rank);
  std::fprintf(stderr, "unknown type %s\n", type.c_str());
  return 2;
}
