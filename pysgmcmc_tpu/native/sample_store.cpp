// Ring-buffer sample store for out-of-core posterior histories.
//
// The reference keeps its posterior ensemble in a host-side Python deque
// (/root/reference/pysgmcmc/models/bayesian_neural_network.py:290), which
// caps history length at what fits in interpreter memory and costs Python
// object overhead per snapshot.  At production scale (thousands of chains,
// millions of retained draws) histories stream from the device to the host;
// this store gives them an O(1)-append, optionally file-backed (mmap) ring
// buffer with zero Python overhead on the hot path.
//
// C API, consumed from Python via ctypes (pysgmcmc_tpu/utils/sample_store.py).
// Rows are float32 vectors of fixed width; capacity is the maximum number of
// retained rows (deque-maxlen semantics: appends beyond capacity overwrite
// the oldest rows).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Store {
  float* data = nullptr;       // capacity * width floats
  int64_t capacity = 0;        // max retained rows
  int64_t width = 0;           // floats per row
  int64_t total_appended = 0;  // monotone count of rows ever appended
  int64_t head = 0;            // ring index of the next write
  int fd = -1;                 // -1 => anonymous memory
  size_t bytes = 0;
};

}  // namespace

extern "C" {

// Create a store. path == nullptr -> anonymous memory; otherwise the ring
// is mmap'ed onto the file (pre-sized), surviving process exit.
void* sample_store_create(const char* path, int64_t capacity, int64_t width) {
  if (capacity <= 0 || width <= 0) return nullptr;
  Store* store = new Store();
  store->capacity = capacity;
  store->width = width;
  store->bytes = static_cast<size_t>(capacity) * width * sizeof(float);

  if (path == nullptr) {
    store->data = static_cast<float*>(
        mmap(nullptr, store->bytes, PROT_READ | PROT_WRITE,
             MAP_PRIVATE | MAP_ANONYMOUS, -1, 0));
  } else {
    store->fd = open(path, O_RDWR | O_CREAT, 0644);
    if (store->fd < 0 || ftruncate(store->fd, store->bytes) != 0) {
      if (store->fd >= 0) close(store->fd);
      delete store;
      return nullptr;
    }
    store->data = static_cast<float*>(
        mmap(nullptr, store->bytes, PROT_READ | PROT_WRITE, MAP_SHARED,
             store->fd, 0));
  }
  if (store->data == MAP_FAILED) {
    if (store->fd >= 0) close(store->fd);
    delete store;
    return nullptr;
  }
  return store;
}

// Append n_rows rows (row-major float32). O(1) amortized; overwrites the
// oldest rows when full.
void sample_store_append(void* handle, const float* rows, int64_t n_rows) {
  Store* store = static_cast<Store*>(handle);
  if (n_rows >= store->capacity) {
    // only the trailing `capacity` rows survive; ring restarts at 0
    const float* src = rows + (n_rows - store->capacity) * store->width;
    memcpy(store->data, src, store->bytes);
    store->total_appended += n_rows;
    store->head = 0;
    return;
  }
  int64_t pos = store->head;
  int64_t tail = store->capacity - pos;  // rows until wraparound
  int64_t first = n_rows < tail ? n_rows : tail;
  memcpy(store->data + pos * store->width, rows,
         static_cast<size_t>(first) * store->width * sizeof(float));
  if (n_rows > first) {
    memcpy(store->data, rows + first * store->width,
           static_cast<size_t>(n_rows - first) * store->width * sizeof(float));
  }
  store->total_appended += n_rows;
  store->head = (pos + n_rows) % store->capacity;
}

// Number of rows currently retained (<= capacity).
int64_t sample_store_len(const void* handle) {
  const Store* store = static_cast<const Store*>(handle);
  return store->total_appended < store->capacity ? store->total_appended
                                                 : store->capacity;
}

// Total rows ever appended (for thinning bookkeeping across overwrites).
int64_t sample_store_total(const void* handle) {
  return static_cast<const Store*>(handle)->total_appended;
}

// Copy `count` rows starting at logical index `start` (0 = oldest retained)
// into `out`. Returns rows copied (clamped to the retained range).
int64_t sample_store_get(const void* handle, int64_t start, int64_t count,
                         float* out) {
  const Store* store = static_cast<const Store*>(handle);
  int64_t len = sample_store_len(handle);
  if (start < 0 || start >= len) return 0;
  if (count > len - start) count = len - start;

  int64_t oldest =
      store->total_appended <= store->capacity ? 0 : store->head;
  for (int64_t i = 0; i < count; ++i) {
    int64_t ring = (oldest + start + i) % store->capacity;
    memcpy(out + i * store->width, store->data + ring * store->width,
           static_cast<size_t>(store->width) * sizeof(float));
  }
  return count;
}

void sample_store_close(void* handle) {
  Store* store = static_cast<Store*>(handle);
  munmap(store->data, store->bytes);
  if (store->fd >= 0) close(store->fd);
  delete store;
}

}  // extern "C"
