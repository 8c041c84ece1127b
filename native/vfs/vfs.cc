// Native VFR feature-store reader.
//
// The reference's data plane reads LMDB through the C lmdb library plus
// per-item pickle decode (vilbert/datasets/_image_features_reader.py:49-90).
// This library is the TPU-host equivalent for our VFR format
// (vilbert_tpu/data/feature_store.py): one mmap'd flat file, an msgpack
// index parsed once at open, zero-copy record lookups, and a background
// prefetch thread pool that warms the page cache ahead of the training
// loop (replacing tensorpack's ZMQ worker fleet for the IO half).
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

#pragma pack(push, 1)
struct FileHeader {
  char magic[4];      // "VFR1"
  uint64_t index_offset;
  uint64_t num_records;
};
struct RecordHeader {
  uint32_t num_boxes;
  uint32_t image_h;
  uint32_t image_w;
  uint8_t has_target;
};
#pragma pack(pop)

// ---- minimal msgpack reader (subset used by VrfWriter: maps keyed by str,
// values str/uint/map) --------------------------------------------------------

struct MsgpackReader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t read_uint_sized(int n) {
    if (p + n > end) { ok = false; return 0; }
    uint64_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 8) | *p++;
    return v;
  }

  bool read_str(std::string* out) {
    if (p >= end) return false;
    uint8_t b = *p++;
    uint64_t len;
    if ((b & 0xe0) == 0xa0) len = b & 0x1f;          // fixstr
    else if (b == 0xd9) len = read_uint_sized(1);     // str8
    else if (b == 0xda) len = read_uint_sized(2);     // str16
    else if (b == 0xdb) len = read_uint_sized(4);     // str32
    else return false;
    if (p + len > end) return false;
    out->assign(reinterpret_cast<const char*>(p), len);
    p += len;
    return true;
  }

  bool read_uint(uint64_t* out) {
    if (p >= end) return false;
    uint8_t b = *p++;
    if (b <= 0x7f) { *out = b; return true; }         // positive fixint
    if (b == 0xcc) { *out = read_uint_sized(1); return ok; }
    if (b == 0xcd) { *out = read_uint_sized(2); return ok; }
    if (b == 0xce) { *out = read_uint_sized(4); return ok; }
    if (b == 0xcf) { *out = read_uint_sized(8); return ok; }
    return false;
  }

  bool read_map_len(uint64_t* out) {
    if (p >= end) return false;
    uint8_t b = *p++;
    if ((b & 0xf0) == 0x80) { *out = b & 0x0f; return true; }  // fixmap
    if (b == 0xde) { *out = read_uint_sized(2); return ok; }    // map16
    if (b == 0xdf) { *out = read_uint_sized(4); return ok; }    // map32
    return false;
  }
};

// ---- prefetch thread pool ---------------------------------------------------

class Prefetcher {
 public:
  explicit Prefetcher(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; i++)
      threads_.emplace_back([this] { worker(); });
  }
  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void enqueue(const void* addr, size_t len) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      work_.emplace_back(addr, len);
    }
    cv_.notify_one();
  }

 private:
  void worker() {
    for (;;) {
      std::pair<const void*, size_t> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !work_.empty(); });
        if (stop_ && work_.empty()) return;
        job = work_.front();
        work_.pop_front();
      }
      // touch every page to pull the record into the page cache
      const volatile char* c = static_cast<const volatile char*>(job.first);
      size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
      char sink = 0;
      for (size_t off = 0; off < job.second; off += page) sink ^= c[off];
      (void)sink;
    }
  }

  std::vector<std::thread> threads_;
  std::deque<std::pair<const void*, size_t>> work_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t feature_dim = 0;
  uint64_t target_dim = 0;
  std::unordered_map<std::string, uint64_t> index;
  std::vector<const char*> key_ptrs;   // stable key storage for vfs_keys
  std::vector<std::string> key_store;
  Prefetcher* prefetcher = nullptr;
};

size_t record_bytes(const Store* s, const RecordHeader* rh) {
  size_t n = rh->num_boxes;
  size_t bytes = sizeof(RecordHeader) + n * s->feature_dim * 4 + n * 4 * 4;
  if (rh->has_target) bytes += n * s->target_dim * 4;
  return bytes;
}

}  // namespace

extern "C" {

struct VfsRecord {
  uint32_t num_boxes;
  uint32_t image_h;
  uint32_t image_w;
  uint8_t has_target;
  const float* features;  // [num_boxes, feature_dim]
  const float* boxes;     // [num_boxes, 4]
  const float* target;    // [num_boxes, target_dim] or null
};

void* vfs_open(const char* path, int prefetch_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { close(fd); return nullptr; }

  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;

  const auto* hdr = reinterpret_cast<const FileHeader*>(s->base);
  if (memcmp(hdr->magic, "VFR1", 4) != 0 || hdr->index_offset >= s->size) {
    munmap(base, st.st_size); close(fd); delete s; return nullptr;
  }

  MsgpackReader r{s->base + hdr->index_offset, s->base + s->size};
  uint64_t meta_len;
  if (!r.read_map_len(&meta_len)) { delete s; return nullptr; }
  for (uint64_t i = 0; i < meta_len; i++) {
    std::string key;
    if (!r.read_str(&key)) { delete s; return nullptr; }
    if (key == "index") {
      uint64_t n;
      if (!r.read_map_len(&n)) { delete s; return nullptr; }
      s->index.reserve(n);
      s->key_store.reserve(n);
      for (uint64_t j = 0; j < n; j++) {
        std::string k;
        uint64_t off;
        if (!r.read_str(&k) || !r.read_uint(&off)) { delete s; return nullptr; }
        s->key_store.push_back(k);
        s->index.emplace(std::move(k), off);
      }
    } else if (key == "feature_dim") {
      if (!r.read_uint(&s->feature_dim)) { delete s; return nullptr; }
    } else if (key == "target_dim") {
      if (!r.read_uint(&s->target_dim)) { delete s; return nullptr; }
    } else {
      delete s;
      return nullptr;  // unknown meta key — refuse rather than mis-parse
    }
  }
  for (const auto& k : s->key_store) s->key_ptrs.push_back(k.c_str());
  if (prefetch_threads > 0) s->prefetcher = new Prefetcher(prefetch_threads);
  return s;
}

void vfs_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return;
  delete s->prefetcher;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  close(s->fd);
  delete s;
}

uint64_t vfs_num_records(void* handle) {
  return static_cast<Store*>(handle)->index.size();
}
uint64_t vfs_feature_dim(void* handle) {
  return static_cast<Store*>(handle)->feature_dim;
}
uint64_t vfs_target_dim(void* handle) {
  return static_cast<Store*>(handle)->target_dim;
}

// Returns a pointer array of NUL-terminated keys (valid until vfs_close).
const char** vfs_keys(void* handle) {
  return const_cast<const char**>(static_cast<Store*>(handle)->key_ptrs.data());
}

int vfs_get(void* handle, const char* key, VfsRecord* out) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  if (it == s->index.end()) return -1;
  const uint8_t* p = s->base + it->second;
  const auto* rh = reinterpret_cast<const RecordHeader*>(p);
  p += sizeof(RecordHeader);
  out->num_boxes = rh->num_boxes;
  out->image_h = rh->image_h;
  out->image_w = rh->image_w;
  out->has_target = rh->has_target;
  out->features = reinterpret_cast<const float*>(p);
  p += static_cast<size_t>(rh->num_boxes) * s->feature_dim * 4;
  out->boxes = reinterpret_cast<const float*>(p);
  p += static_cast<size_t>(rh->num_boxes) * 4 * 4;
  out->target = rh->has_target ? reinterpret_cast<const float*>(p) : nullptr;
  return 0;
}

// Warm the page cache for upcoming keys on the background pool.
void vfs_prefetch(void* handle, const char** keys, int n) {
  auto* s = static_cast<Store*>(handle);
  if (!s->prefetcher) return;
  for (int i = 0; i < n; i++) {
    auto it = s->index.find(keys[i]);
    if (it == s->index.end()) continue;
    const uint8_t* p = s->base + it->second;
    const auto* rh = reinterpret_cast<const RecordHeader*>(p);
    s->prefetcher->enqueue(p, record_bytes(s, rh));
  }
}

}  // extern "C"
