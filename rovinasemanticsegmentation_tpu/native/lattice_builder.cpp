// Native permutohedral-lattice builder.
//
// Host-side companion to models/lattice.py: the per-map lattice build
// (embedding, rounding, rank, barycentric, vertex dedup, blur-neighbor
// table) is irregular pointer-chasing work that belongs on the CPU; the
// per-iteration filtering runs on TPU. This C++ implementation replaces the
// NumPy sort/unique path with an open-addressing hash table, cutting the
// build from O(N (d+1) log) sorting to O(N (d+1)) expected.
//
// Semantics match the reference lattice init
// (/root/reference/third-party/densecrf/src/permutohedral.cpp:323-474) and
// the NumPy implementation bit-for-bit up to vertex numbering (here:
// insertion order, like the reference).
//
// Exposed as a C ABI for ctypes; no Python headers needed.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Open-addressing hash table over int16 keys of fixed dimension d.
class KeyTable {
 public:
  KeyTable(int key_size, size_t expected)
      : key_size_(key_size), capacity_(1), mask_(0) {
    while (capacity_ < expected * 2) capacity_ <<= 1;
    mask_ = capacity_ - 1;
    slots_.assign(capacity_, -1);
    keys_.reserve(expected * key_size);
  }

  int size() const { return static_cast<int>(keys_.size() / key_size_); }

  const int16_t* key(int idx) const { return keys_.data() + idx * key_size_; }

  uint64_t hash(const int16_t* k) const {
    uint64_t h = 1469598103934665603ull;  // FNV-1a
    for (int i = 0; i < key_size_; ++i) {
      h ^= static_cast<uint16_t>(k[i]);
      h *= 1099511628211ull;
    }
    return h;
  }

  // Find the key, inserting when requested. Returns vertex id or -1.
  int find(const int16_t* k, bool create) {
    size_t h = hash(k) & mask_;
    while (true) {
      int slot = slots_[h];
      if (slot == -1) {
        if (!create) return -1;
        int id = size();
        slots_[h] = id;
        keys_.insert(keys_.end(), k, k + key_size_);
        return id;
      }
      if (std::memcmp(key(slot), k, key_size_ * sizeof(int16_t)) == 0)
        return slot;
      h = (h + 1) & mask_;
    }
  }

 private:
  int key_size_;
  size_t capacity_;
  size_t mask_;
  std::vector<int> slots_;
  std::vector<int16_t> keys_;
};

}  // namespace

extern "C" {

// Build the lattice for `features` [n, d] (row-major).
// Outputs (caller-allocated):
//   offsets      [n, d+1] int32
//   barycentric  [n, d+1] float32
// Returns M (vertex count) or -1 on error. Vertex keys are kept in
// thread-local state for the immediately following
// rovina_lattice_neighbors call.
static thread_local KeyTable* g_table = nullptr;
static thread_local int g_dim = 0;

int rovina_lattice_build(const float* features, int n, int d,
                         int32_t* offsets, float* barycentric) {
  delete g_table;
  g_table = new KeyTable(d, static_cast<size_t>(n) * (d + 1));
  g_dim = d;

  std::vector<float> scale(d);
  const float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale[i] = 1.0f / std::sqrt(static_cast<float>((i + 2) * (i + 1))) *
               inv_std_dev;

  std::vector<int16_t> canonical((d + 1) * (d + 1));
  for (int i = 0; i <= d; ++i) {
    for (int j = 0; j <= d - i; ++j) canonical[i * (d + 1) + j] = i;
    for (int j = d - i + 1; j <= d; ++j)
      canonical[i * (d + 1) + j] = i - (d + 1);
  }

  std::vector<float> elevated(d + 1), rem0(d + 1), bary(d + 2);
  std::vector<int16_t> rank(d + 1), key(d + 1);
  const float down_factor = 1.0f / (d + 1);
  const float up_factor = static_cast<float>(d + 1);

  for (int k = 0; k < n; ++k) {
    const float* f = features + static_cast<size_t>(k) * d;

    // Elevate onto the hyperplane (permutohedral.cpp:360-370 semantics).
    float sm = 0;
    for (int j = d; j > 0; --j) {
      const float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Round to the nearest 0-colored remainder point.
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = down_factor * elevated[i];
      const float up = std::ceil(v) * up_factor;
      const float down = std::floor(v) * up_factor;
      const int rd = (up - elevated[i] < elevated[i] - down)
                         ? static_cast<int>(up)
                         : static_cast<int>(down);
      rem0[i] = static_cast<float>(rd);
      sum += static_cast<int>(rd * down_factor);
    }

    // Rank within the sorted differences.
    for (int i = 0; i <= d; ++i) rank[i] = 0;
    for (int i = 0; i < d; ++i) {
      const double di = elevated[i] - rem0[i];
      for (int j = i + 1; j <= d; ++j) {
        if (di < elevated[j] - rem0[j])
          ++rank[i];
        else
          ++rank[j];
      }
    }

    // Wrap back onto the plane.
    for (int i = 0; i <= d; ++i) {
      rank[i] = static_cast<int16_t>(rank[i] + sum);
      if (rank[i] < 0) {
        rank[i] = static_cast<int16_t>(rank[i] + d + 1);
        rem0[i] += d + 1;
      } else if (rank[i] > d) {
        rank[i] = static_cast<int16_t>(rank[i] - (d + 1));
        rem0[i] -= d + 1;
      }
    }

    // Barycentric coordinates.
    for (int i = 0; i <= d + 1; ++i) bary[i] = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = (elevated[i] - rem0[i]) * down_factor;
      bary[d - rank[i]] += v;
      bary[d - rank[i] + 1] -= v;
    }
    bary[0] += 1.0f + bary[d + 1];

    // Vertex per remainder.
    for (int r = 0; r <= d; ++r) {
      for (int i = 0; i < d; ++i)
        key[i] = static_cast<int16_t>(rem0[i] + canonical[r * (d + 1) + rank[i]]);
      offsets[static_cast<size_t>(k) * (d + 1) + r] = g_table->find(key.data(), true);
      barycentric[static_cast<size_t>(k) * (d + 1) + r] = bary[r];
    }
  }
  return g_table->size();
}

// Fill the blur-neighbor tables [d+1, M] after rovina_lattice_build.
// Missing neighbors get `missing` (the zero slot).
int rovina_lattice_neighbors(int32_t* blur_n1, int32_t* blur_n2, int missing) {
  if (!g_table) return -1;
  const int d = g_dim;
  const int m = g_table->size();
  std::vector<int16_t> n1(d), n2(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < m; ++i) {
      const int16_t* key = g_table->key(i);
      for (int k = 0; k < d; ++k) {
        n1[k] = static_cast<int16_t>(key[k] - 1);
        n2[k] = static_cast<int16_t>(key[k] + 1);
      }
      if (j < d) {
        n1[j] = static_cast<int16_t>(key[j] + d);
        n2[j] = static_cast<int16_t>(key[j] - d);
      }
      const int f1 = g_table->find(n1.data(), false);
      const int f2 = g_table->find(n2.data(), false);
      blur_n1[static_cast<size_t>(j) * m + i] = f1 < 0 ? missing : f1;
      blur_n2[static_cast<size_t>(j) * m + i] = f2 < 0 ? missing : f2;
    }
  }
  delete g_table;
  g_table = nullptr;
  return m;
}

}  // extern "C"
