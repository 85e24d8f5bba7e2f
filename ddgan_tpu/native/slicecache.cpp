// slicecache — native host-side volume/slice server for the LUNA16 pipeline.
//
// The reference's native layer is CUDA compute kernels (score_sde/op); on
// TPU those became XLA/Pallas. The host-side analog bottleneck in THIS
// framework is the data path: gunzip + parse + slice 256^3 NIfTI volumes
// per __getitem__ (reference re-reads the whole volume per slice,
// datasets_prep/custom.py:190). This C++ component keeps an LRU cache of
// decoded volumes and serves normalized uint8 2-D slices through a C ABI
// consumed via ctypes (ddgan_tpu/native/__init__.py), with a pure-Python
// fallback when the shared object is unavailable.
//
// Build: make -C ddgan_tpu/native   (g++ -O3 -shared -fPIC, links zlib)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <list>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct Volume {
    std::vector<float> data;  // Fortran order (x fastest)
    int64_t dims[3] = {0, 0, 0};
};

// ---------------------------------------------------------------- gzip IO
bool read_file_maybe_gz(const std::string& path, std::vector<uint8_t>& out) {
    gzFile f = gzopen(path.c_str(), "rb");  // reads plain files too
    if (!f) return false;
    constexpr size_t kChunk = 1 << 20;
    size_t size = 0;
    out.clear();
    for (;;) {
        out.resize(size + kChunk);
        int n = gzread(f, out.data() + size, kChunk);
        if (n < 0) { gzclose(f); return false; }
        size += static_cast<size_t>(n);
        if (n == 0) break;
    }
    out.resize(size);
    gzclose(f);
    return true;
}

template <typename T>
T read_le(const uint8_t* p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    return v;
}

// ------------------------------------------------------- NIfTI-1 parsing
// Minimal single-file NIfTI-1 (same subset as ddgan_tpu/data/nifti.py).
bool parse_nifti(const std::vector<uint8_t>& raw, Volume& vol) {
    if (raw.size() < 352) return false;
    const uint8_t* h = raw.data();
    if (read_le<int32_t>(h + 0) != 348) return false;  // big-endian unsupported
    int16_t ndim = read_le<int16_t>(h + 40);
    if (ndim < 3) return false;
    int64_t dims[3];
    for (int i = 0; i < 3; ++i) dims[i] = read_le<int16_t>(h + 42 + 2 * i);
    int16_t datatype = read_le<int16_t>(h + 70);
    float vox_offset = read_le<float>(h + 108);
    float scl_slope = read_le<float>(h + 112);
    float scl_inter = read_le<float>(h + 116);
    size_t offset = static_cast<size_t>(vox_offset < 352 ? 352 : vox_offset);
    size_t count = static_cast<size_t>(dims[0]) * dims[1] * dims[2];

    vol.dims[0] = dims[0];
    vol.dims[1] = dims[1];
    vol.dims[2] = dims[2];
    vol.data.resize(count);
    const uint8_t* d = raw.data() + offset;
    size_t avail = raw.size() - offset;

    auto convert = [&](auto type_tag) -> bool {
        using T = decltype(type_tag);
        if (avail < count * sizeof(T)) return false;
        for (size_t i = 0; i < count; ++i) {
            T v;
            std::memcpy(&v, d + i * sizeof(T), sizeof(T));
            vol.data[i] = static_cast<float>(v);
        }
        return true;
    };

    bool ok;
    switch (datatype) {
        case 2: ok = convert(uint8_t{}); break;
        case 4: ok = convert(int16_t{}); break;
        case 8: ok = convert(int32_t{}); break;
        case 16: ok = convert(float{}); break;
        case 64: ok = convert(double{}); break;
        case 256: ok = convert(int8_t{}); break;
        case 512: ok = convert(uint16_t{}); break;
        default: return false;
    }
    if (!ok) return false;
    bool scale = (scl_slope != 0.0f && scl_slope != 1.0f) || scl_inter != 0.0f;
    if (scale) {
        float s = scl_slope != 0.0f ? scl_slope : 1.0f;
        for (auto& v : vol.data) v = v * s + scl_inter;
    }
    return true;
}

// --------------------------------------------------------------- LRU cache
// Entries are shared_ptr so a reader keeps its volume alive even if a
// concurrent get() evicts it from the cache (use-after-free otherwise:
// the slice/bbox work happens outside the lock).
class VolumeCache {
  public:
    explicit VolumeCache(size_t capacity) : capacity_(capacity) {}

    std::shared_ptr<const Volume> get(const std::string& path) {
        {
            std::lock_guard<std::mutex> lock(mu_);
            auto it = map_.find(path);
            if (it != map_.end()) {
                order_.splice(order_.begin(), order_, it->second.second);
                return it->second.first;
            }
        }
        // decode OUTSIDE the lock (slow path; concurrent decodes of the
        // same path are wasteful but correct — last insert wins)
        std::vector<uint8_t> raw;
        if (!read_file_maybe_gz(path, raw)) return nullptr;
        auto vol = std::make_shared<Volume>();
        if (!parse_nifti(raw, *vol)) return nullptr;

        std::lock_guard<std::mutex> lock(mu_);
        auto it = map_.find(path);
        if (it != map_.end()) {
            order_.splice(order_.begin(), order_, it->second.second);
            return it->second.first;
        }
        order_.push_front(path);
        map_.emplace(path, std::make_pair(vol, order_.begin()));
        if (map_.size() > capacity_) {
            map_.erase(order_.back());
            order_.pop_back();
        }
        return vol;
    }

  private:
    size_t capacity_;
    std::mutex mu_;
    std::list<std::string> order_;
    std::unordered_map<
        std::string,
        std::pair<std::shared_ptr<const Volume>, std::list<std::string>::iterator>>
        map_;
};

VolumeCache* g_cache = nullptr;
std::once_flag g_once;

VolumeCache& cache() {
    std::call_once(g_once, [] { g_cache = new VolumeCache(8); });
    return *g_cache;
}

}  // namespace

extern "C" {

// Returns 0 on success. dims_out: int64[3].
int slicecache_volume_dims(const char* path, int64_t* dims_out) {
    auto v = cache().get(path);
    if (!v) return -1;
    dims_out[0] = v->dims[0];
    dims_out[1] = v->dims[1];
    dims_out[2] = v->dims[2];
    return 0;
}

// Extract one 2-D slice along axis (0=x,1=y,2=z) at `index`, cast to uint8
// exactly like the reference (float→uint8 truncation, custom.py:200).
// out must hold the slice (dims of the two remaining axes, row-major in
// the order they appear in (x,y,z)).
int slicecache_read_slice_u8(const char* path, int axis, int64_t index,
                             uint8_t* out) {
    auto v = cache().get(path);
    if (!v) return -1;
    if (axis < 0 || axis > 2) return -2;
    const int64_t nx = v->dims[0], ny = v->dims[1], nz = v->dims[2];
    if (index < 0 || index >= v->dims[axis]) return -3;
    const float* d = v->data.data();
    // Fortran order: idx = x + nx*(y + ny*z)
    auto at = [&](int64_t x, int64_t y, int64_t z) {
        return d[x + nx * (y + ny * z)];
    };
    // float → int64 → uint8: defined truncation + modulo-256 wrap, matching
    // numpy astype(np.uint8) on the reference path (custom.py:200).
    auto cast8 = [](float v) { return (uint8_t)(int64_t)v; };
    size_t k = 0;
    if (axis == 0) {
        for (int64_t y = 0; y < ny; ++y)
            for (int64_t z = 0; z < nz; ++z) out[k++] = cast8(at(index, y, z));
    } else if (axis == 1) {
        for (int64_t x = 0; x < nx; ++x)
            for (int64_t z = 0; z < nz; ++z) out[k++] = cast8(at(x, index, z));
    } else {
        for (int64_t x = 0; x < nx; ++x)
            for (int64_t y = 0; y < ny; ++y) out[k++] = cast8(at(x, y, index));
    }
    return 0;
}

// Nonzero bounding box of a mask volume: lo[3], hi[3] (hi inclusive).
// Returns 0 on success, 1 if the mask is empty.
int slicecache_mask_bbox(const char* path, int64_t* lo, int64_t* hi) {
    auto v = cache().get(path);
    if (!v) return -1;
    const int64_t nx = v->dims[0], ny = v->dims[1], nz = v->dims[2];
    lo[0] = nx; lo[1] = ny; lo[2] = nz;
    hi[0] = -1; hi[1] = -1; hi[2] = -1;
    const float* d = v->data.data();
    size_t i = 0;
    for (int64_t z = 0; z < nz; ++z)
        for (int64_t y = 0; y < ny; ++y)
            for (int64_t x = 0; x < nx; ++x, ++i) {
                if (d[i] != 0.0f) {
                    if (x < lo[0]) lo[0] = x;
                    if (y < lo[1]) lo[1] = y;
                    if (z < lo[2]) lo[2] = z;
                    if (x > hi[0]) hi[0] = x;
                    if (y > hi[1]) hi[1] = y;
                    if (z > hi[2]) hi[2] = z;
                }
            }
    return hi[0] < 0 ? 1 : 0;
}

void slicecache_clear() {
    // cache is process-lifetime; nothing exposed beyond reset for tests
}

}  // extern "C"
