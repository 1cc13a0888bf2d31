// Fast COLMAP binary model parser.
//
// Native runtime component for the IO-heavy path: large reconstructions
// (10^5..10^6 points after rotation augmentation) parse in ~100x the time in
// pure Python record loops. This parser walks the public COLMAP binary
// layout once and emits flat packed arrays the Python SceneModel consumes
// zero-copy. Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Format (public COLMAP spec, same as pixtrack_tpu/sfm/colmap_io.py):
//   points3D.bin: u64 n; per pt: i64 id, f64 xyz[3], u8 rgb[3], f64 err,
//                 u64 L, L * (i32 image_id, i32 p2d_idx)
//   images.bin:   u64 n; per img: i32 id, f64 q[4], f64 t[3], i32 cam_id,
//                 name\0, u64 m, m * (f64 x, f64 y, i64 p3d_id)
//
// Build: g++ -O3 -shared -fPIC -o libcolmap_fast.so colmap_fast.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Buf {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    template <typename T>
    T read() {
        if (p + sizeof(T) > end) { ok = false; return T{}; }
        T v;
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        return v;
    }
    const char* cstr() {
        const uint8_t* s = p;
        while (p < end && *p) p++;
        if (p >= end) { ok = false; return nullptr; }
        p++;  // skip NUL
        return reinterpret_cast<const char*>(s);
    }
    bool skip(size_t n) {
        if (p + n > end) { ok = false; return false; }
        p += n;
        return true;
    }
};

std::vector<uint8_t> read_file(const char* path) {
    std::vector<uint8_t> data;
    FILE* f = std::fopen(path, "rb");
    if (!f) return data;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data.resize(size);
    if (std::fread(data.data(), 1, size, f) != static_cast<size_t>(size)) {
        data.clear();
    }
    std::fclose(f);
    return data;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- points ----
// Two-pass: pass 0 returns counts, pass 1 fills caller-allocated arrays.
// Returns 0 on success.
int colmap_points3d_counts(const char* path, int64_t* n_points,
                           int64_t* n_track_elems) {
    auto data = read_file(path);
    if (data.empty()) return 1;
    Buf b{data.data(), data.data() + data.size()};
    uint64_t n = b.read<uint64_t>();
    uint64_t tracks = 0;
    for (uint64_t i = 0; i < n && b.ok; i++) {
        b.skip(8 + 24 + 3 + 8);  // id, xyz, rgb, error
        uint64_t L = b.read<uint64_t>();
        tracks += L;
        b.skip(L * 8);
    }
    if (!b.ok) return 2;
    *n_points = static_cast<int64_t>(n);
    *n_track_elems = static_cast<int64_t>(tracks);
    return 0;
}

int colmap_points3d_parse(const char* path, int64_t n_points_expected,
                          int64_t* ids, double* xyz, uint8_t* rgb,
                          double* errors, int64_t* track_offsets,
                          int32_t* track_image_ids, int32_t* track_p2d_idxs) {
    auto data = read_file(path);
    if (data.empty()) return 1;
    Buf b{data.data(), data.data() + data.size()};
    uint64_t n = b.read<uint64_t>();
    if (static_cast<int64_t>(n) != n_points_expected) return 3;
    int64_t cursor = 0;
    for (uint64_t i = 0; i < n && b.ok; i++) {
        ids[i] = b.read<int64_t>();
        for (int k = 0; k < 3; k++) xyz[3 * i + k] = b.read<double>();
        for (int k = 0; k < 3; k++) rgb[3 * i + k] = b.read<uint8_t>();
        errors[i] = b.read<double>();
        uint64_t L = b.read<uint64_t>();
        track_offsets[i] = cursor;
        for (uint64_t t = 0; t < L && b.ok; t++) {
            track_image_ids[cursor] = b.read<int32_t>();
            track_p2d_idxs[cursor] = b.read<int32_t>();
            cursor++;
        }
    }
    track_offsets[n] = cursor;
    return b.ok ? 0 : 2;
}

// ---------------------------------------------------------------- images ----
int colmap_images_counts(const char* path, int64_t* n_images,
                         int64_t* n_obs, int64_t* names_bytes) {
    auto data = read_file(path);
    if (data.empty()) return 1;
    Buf b{data.data(), data.data() + data.size()};
    uint64_t n = b.read<uint64_t>();
    uint64_t obs = 0, nb = 0;
    for (uint64_t i = 0; i < n && b.ok; i++) {
        b.skip(4 + 32 + 24 + 4);  // id, q, t, cam
        const char* name = b.cstr();
        if (name) nb += std::strlen(name) + 1;
        uint64_t m = b.read<uint64_t>();
        obs += m;
        b.skip(m * 24);
    }
    if (!b.ok) return 2;
    *n_images = static_cast<int64_t>(n);
    *n_obs = static_cast<int64_t>(obs);
    *names_bytes = static_cast<int64_t>(nb);
    return 0;
}

int colmap_images_parse(const char* path, int64_t n_images_expected,
                        int32_t* image_ids, double* qvecs, double* tvecs,
                        int32_t* camera_ids, char* names_blob,
                        int64_t* obs_offsets, double* xys,
                        int64_t* point3d_ids) {
    auto data = read_file(path);
    if (data.empty()) return 1;
    Buf b{data.data(), data.data() + data.size()};
    uint64_t n = b.read<uint64_t>();
    if (static_cast<int64_t>(n) != n_images_expected) return 3;
    int64_t cursor = 0;
    char* name_out = names_blob;
    for (uint64_t i = 0; i < n && b.ok; i++) {
        image_ids[i] = b.read<int32_t>();
        for (int k = 0; k < 4; k++) qvecs[4 * i + k] = b.read<double>();
        for (int k = 0; k < 3; k++) tvecs[3 * i + k] = b.read<double>();
        camera_ids[i] = b.read<int32_t>();
        const char* name = b.cstr();
        if (!name) return 2;
        size_t len = std::strlen(name) + 1;
        std::memcpy(name_out, name, len);
        name_out += len;
        uint64_t m = b.read<uint64_t>();
        obs_offsets[i] = cursor;
        for (uint64_t t = 0; t < m && b.ok; t++) {
            xys[2 * cursor] = b.read<double>();
            xys[2 * cursor + 1] = b.read<double>();
            point3d_ids[cursor] = b.read<int64_t>();
            cursor++;
        }
    }
    obs_offsets[n] = cursor;
    return b.ok ? 0 : 2;
}

}  // extern "C"
