// Native host-side components for broadphase_tpu.
//
// The reference implements its entire engine natively (Rust); in the TPU
// rebuild the device path is JAX/XLA, and this library provides the
// host-side native equivalents (SURVEY.md §7 step 9):
//
//   * Index64_3D Morton codec (reference src/index.rs:174-208, :209-290)
//   * quantization + cell emission "extend" oracle (src/geom.rs:148-305,
//     src/layer.rs:94-121)
//   * the sequential stack-sweep scan (src/layer.rs:550-573) — the golden
//     reference at sizes where the Python oracle is too slow (1M+ objects)
//   * a sweep-and-prune O(n log n + k) exact AABB overlap oracle
//   * BR_SCENE (bincode v1.2) load/save (data/src/lib.rs)
//
// Exposed as a plain C ABI consumed through ctypes
// (broadphase_tpu/utils/native.py).  No Python.h dependency.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Index64_3D codec (5 depth bits + 3x19 axis bits; src/index.rs:295)
// ---------------------------------------------------------------------------

static const uint32_t AXIS_BITS = 19;
static const uint32_t DEPTH_BITS = 5;
static const uint32_t DIM = 3;
static const uint32_t KEY_BITS = DEPTH_BITS + DIM * AXIS_BITS;  // 62
static const uint64_t DEPTH_MASK = (1ull << DEPTH_BITS) - 1;

static inline uint64_t spread3(uint32_t v) {
    // spread the top 19 bits of v to stride-3 positions
    uint64_t x = v >> (32 - AXIS_BITS);
    uint64_t out = 0;
    for (uint32_t i = 0; i < AXIS_BITS; i++)
        if ((x >> i) & 1) out |= 1ull << (3 * i);
    return out;
}

static inline uint32_t compress3(uint64_t x) {
    uint32_t v = 0;
    for (uint32_t i = 0; i < AXIS_BITS; i++)
        if ((x >> (3 * i)) & 1) v |= 1u << i;
    return v << (32 - AXIS_BITS);
}

static inline uint64_t make_key(uint32_t x, uint32_t y, uint32_t z,
                                uint32_t depth) {
    uint64_t morton = spread3(x) | (spread3(y) << 1) | (spread3(z) << 2);
    if (depth > AXIS_BITS) depth = AXIS_BITS;
    return (morton << DEPTH_BITS) | depth;
}

void bp_encode_index64_3d(const uint32_t* xyz, const uint32_t* depth,
                          uint64_t n, uint64_t* out) {
    for (uint64_t i = 0; i < n; i++)
        out[i] = make_key(xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2],
                          depth[i]);
}

void bp_decode_index64_3d(const uint64_t* keys, uint64_t n,
                          uint32_t* xyz, uint32_t* depth) {
    for (uint64_t i = 0; i < n; i++) {
        uint64_t k = keys[i];
        depth[i] = (uint32_t)(k & DEPTH_MASK);
        uint64_t m = k >> DEPTH_BITS;
        xyz[3 * i]     = compress3(m);
        xyz[3 * i + 1] = compress3(m >> 1);
        xyz[3 * i + 2] = compress3(m >> 2);
    }
}

// ---------------------------------------------------------------------------
// extend: quantize + per-object cell emission (Index64_3D)
// ---------------------------------------------------------------------------

static const float RANGE_MAX = 4294967040.0f;  // 0xffff_ff00 (src/geom.rs:152)

static inline uint32_t quantize(float smin, float ssize, float v) {
    float x = (v - smin) / ssize * RANGE_MAX;   // f32 steps, like the Rust
    if (!(x > 0.0f)) return 0;                  // NaN or <= 0
    if (x >= 4294967295.0f) return 0xFFFFFFFFu;
    return (uint32_t)x;                         // trunc toward zero
}

// returns number of (key, id) records written; *invalid_count out
uint64_t bp_extend_index64_3d(
    const float* system_min, const float* system_max,
    const float* bounds_min, const float* bounds_max,   // (n,3) row-major
    const uint32_t* ids, uint64_t n, uint32_t min_depth,
    uint64_t* out_keys, uint32_t* out_ids, uint64_t out_cap,
    uint64_t* invalid_count)
{
    uint64_t w = 0, invalid = 0;
    float ssize[3];
    for (int a = 0; a < 3; a++) ssize[a] = system_max[a] - system_min[a];
    for (uint64_t i = 0; i < n; i++) {
        const float* bmin = bounds_min + 3 * i;
        const float* bmax = bounds_max + 3 * i;
        bool contained = true;
        for (int a = 0; a < 3; a++)
            if (system_min[a] > bmin[a] || system_max[a] < bmax[a])
                { contained = false; break; }
        if (!contained) { invalid++; continue; }

        uint32_t lmin[3], lmax[3];
        for (int a = 0; a < 3; a++) {
            lmin[a] = quantize(system_min[a], ssize[a], bmin[a]);
            lmax[a] = quantize(system_min[a], ssize[a], bmax[a]);
        }
        // depth = leading_zeros(max_axis(sizei) - 1) (src/geom.rs:189-199)
        uint32_t size_max = 0;
        for (int a = 0; a < 3; a++) {
            uint32_t s = lmax[a] - lmin[a] + 1;   // wrapping
            if (s > size_max) size_max = s;
        }
        uint32_t v = size_max - 1;                // wrapping
        uint32_t lz = v == 0 ? 32 : (uint32_t)__builtin_clz(v);
        uint32_t depth = lz < min_depth ? min_depth : lz;
        if (depth > AXIS_BITS) depth = AXIS_BITS;

        if (depth == 0) {
            if (w < out_cap) { out_keys[w] = 0; out_ids[w] = ids[i]; }
            w++;
            continue;
        }
        uint64_t scale = 1ull << (32 - depth);
        uint32_t mask = (uint32_t)(scale - 1);
        uint32_t tmin[3], tmax[3];
        for (int a = 0; a < 3; a++) {
            tmin[a] = lmin[a] & ~mask;
            tmax[a] = lmax[a] & ~mask;
        }
        // grid walk, x fastest (src/geom.rs:260-304)
        for (uint64_t z = tmin[2];; z += scale) {
            for (uint64_t y = tmin[1];; y += scale) {
                for (uint64_t x = tmin[0];; x += scale) {
                    if (w < out_cap) {
                        out_keys[w] = make_key((uint32_t)x, (uint32_t)y,
                                               (uint32_t)z, depth);
                        out_ids[w] = ids[i];
                    }
                    w++;
                    if (x >= tmax[0]) break;
                }
                if (y >= tmax[1]) break;
            }
            if (z >= tmax[2]) break;
        }
    }
    *invalid_count = invalid;
    return w;
}

// ---------------------------------------------------------------------------
// sort + sequential stack-sweep scan (the golden reference path)
// ---------------------------------------------------------------------------

void bp_sort_tree(uint64_t* keys, uint32_t* ids, uint64_t n) {
    std::vector<uint64_t> idx(n);
    for (uint64_t i = 0; i < n; i++) idx[i] = i;
    std::sort(idx.begin(), idx.end(), [&](uint64_t a, uint64_t b) {
        if (keys[a] != keys[b]) return keys[a] < keys[b];
        return ids[a] < ids[b];
    });
    std::vector<uint64_t> k2(n);
    std::vector<uint32_t> i2(n);
    for (uint64_t i = 0; i < n; i++) { k2[i] = keys[idx[i]]; i2[i] = ids[idx[i]]; }
    memcpy(keys, k2.data(), n * sizeof(uint64_t));
    memcpy(ids, i2.data(), n * sizeof(uint32_t));
}

static inline bool overlaps_key(uint64_t a, uint64_t b) {
    uint32_t da = (uint32_t)(a & DEPTH_MASK), db = (uint32_t)(b & DEPTH_MASK);
    uint32_t d = da < db ? da : db;
    if (d == 0) return true;
    uint64_t level_mask =
        (((1ull << (DIM * d)) - 1) << (KEY_BITS - DIM * d));
    return ((a ^ b) & level_mask) == 0;
}

// sorted (keys, ids) -> sorted+deduped pairs (a=later, b=earlier), packed
// a<<32|b.  Returns pair count (may exceed out_cap; only out_cap written).
uint64_t bp_scan_seq(const uint64_t* keys, const uint32_t* ids, uint64_t n,
                     uint64_t* out_pairs, uint64_t out_cap) {
    std::vector<std::pair<uint64_t, uint32_t>> stack;
    std::vector<uint64_t> pairs;
    stack.reserve(256);
    for (uint64_t i = 0; i < n; i++) {
        uint64_t key = keys[i];
        uint32_t id = ids[i];
        while (!stack.empty() && !overlaps_key(key, stack.back().first))
            stack.pop_back();
        bool on_stack = false;
        for (auto& e : stack) if (e.second == id) { on_stack = true; break; }
        if (on_stack) continue;              // src/layer.rs:563-565
        for (auto& e : stack)
            if (e.second != id)
                pairs.push_back(((uint64_t)id << 32) | e.second);
        stack.emplace_back(key, id);
    }
    std::sort(pairs.begin(), pairs.end());
    pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
    uint64_t cnt = pairs.size();
    uint64_t w = cnt < out_cap ? cnt : out_cap;
    memcpy(out_pairs, pairs.data(), w * sizeof(uint64_t));
    return cnt;
}

// ---------------------------------------------------------------------------
// exact AABB overlap oracle: sweep and prune along x
// ---------------------------------------------------------------------------

uint64_t bp_brute_force_pairs(const float* bounds_min, const float* bounds_max,
                              const uint32_t* ids, uint64_t n, int dim,
                              uint64_t* out_pairs, uint64_t out_cap) {
    std::vector<uint64_t> order(n);
    for (uint64_t i = 0; i < n; i++) order[i] = i;
    std::sort(order.begin(), order.end(), [&](uint64_t a, uint64_t b) {
        return bounds_min[dim * a] < bounds_min[dim * b];
    });
    std::vector<uint64_t> pairs;
    for (uint64_t oi = 0; oi < n; oi++) {
        uint64_t i = order[oi];
        float xmax = bounds_max[dim * i];
        for (uint64_t oj = oi + 1; oj < n; oj++) {
            uint64_t j = order[oj];
            if (bounds_min[dim * j] > xmax) break;
            bool hit = true;
            for (int a = 1; a < dim; a++) {
                if (bounds_min[dim * i + a] > bounds_max[dim * j + a] ||
                    bounds_max[dim * i + a] < bounds_min[dim * j + a])
                    { hit = false; break; }
            }
            if (!hit) continue;
            uint32_t a_ = ids[i], b_ = ids[j];
            if (a_ == b_) continue;
            uint64_t p = a_ < b_ ? ((uint64_t)a_ << 32) | b_
                                 : ((uint64_t)b_ << 32) | a_;
            pairs.push_back(p);
        }
    }
    std::sort(pairs.begin(), pairs.end());
    pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
    uint64_t cnt = pairs.size();
    uint64_t w = cnt < out_cap ? cnt : out_cap;
    memcpy(out_pairs, pairs.data(), w * sizeof(uint64_t));
    return cnt;
}

// ---------------------------------------------------------------------------
// BR_SCENE bincode IO (data/src/lib.rs; header + SceneV1_2)
// ---------------------------------------------------------------------------

struct BpScene {
    float system_min[3], system_max[3];
    std::vector<float> bounds;       // (n, 6): min3 + max3
    std::vector<uint32_t> ids;
    uint32_t layer_min_depth = 0;
    std::vector<uint64_t> layer_keys;
    std::vector<uint32_t> layer_ids;
    uint8_t layer_sorted = 1;
    std::vector<uint64_t> collisions;  // packed a<<32|b
    std::vector<uint32_t> hits;
    uint8_t has_nearest = 0;
    uint32_t nearest_id = 0;
    float nearest_dist = 0;
};

static bool rd(FILE* f, void* p, size_t sz) { return fread(p, 1, sz, f) == sz; }

void* bp_scene_load(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    char sig[8];
    uint16_t ver[2];
    if (!rd(f, sig, 8) || memcmp(sig, "BR_SCENE", 8) != 0 ||
        !rd(f, ver, 4) || ver[0] != 1 || ver[1] > 2) { fclose(f); return nullptr; }
    BpScene* s = new BpScene();
    bool ok = rd(f, s->system_min, 12) && rd(f, s->system_max, 12);
    uint64_t n = 0;
    ok = ok && rd(f, &n, 8);
    if (ok) {
        s->bounds.resize(n * 6);
        s->ids.resize(n);
        for (uint64_t i = 0; ok && i < n; i++) {
            ok = rd(f, &s->bounds[6 * i], 24) && rd(f, &s->ids[i], 4);
        }
    }
    if (ok && ver[1] >= 1) {
        uint64_t tn = 0;
        ok = rd(f, &s->layer_min_depth, 4) && rd(f, &tn, 8);
        if (ok) {
            s->layer_keys.resize(tn);
            s->layer_ids.resize(tn);
            for (uint64_t i = 0; ok && i < tn; i++)
                ok = rd(f, &s->layer_keys[i], 8) && rd(f, &s->layer_ids[i], 4);
            ok = ok && rd(f, &s->layer_sorted, 1);
        }
    }
    if (ok && ver[1] >= 2) {
        uint64_t cn = 0;
        ok = rd(f, &cn, 8);
        if (ok) {
            s->collisions.resize(cn);
            for (uint64_t i = 0; ok && i < cn; i++) {
                uint32_t ab[2];
                ok = rd(f, ab, 8);
                s->collisions[i] = ((uint64_t)ab[0] << 32) | ab[1];
            }
        }
        uint64_t hn = 0;
        ok = ok && rd(f, &hn, 8);
        if (ok) {
            s->hits.resize(hn);
            ok = hn == 0 || rd(f, s->hits.data(), hn * 4);
        }
        ok = ok && rd(f, &s->has_nearest, 1);
        if (ok && s->has_nearest)
            ok = rd(f, &s->nearest_id, 4) && rd(f, &s->nearest_dist, 4);
    }
    fclose(f);
    if (!ok) { delete s; return nullptr; }
    return s;
}

int bp_scene_save(const void* sv, const char* path) {
    const BpScene* s = (const BpScene*)sv;
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    uint16_t ver[2] = {1, 2};
    fwrite("BR_SCENE", 1, 8, f);
    fwrite(ver, 1, 4, f);
    fwrite(s->system_min, 1, 12, f);
    fwrite(s->system_max, 1, 12, f);
    uint64_t n = s->ids.size();
    fwrite(&n, 1, 8, f);
    for (uint64_t i = 0; i < n; i++) {
        fwrite(&s->bounds[6 * i], 1, 24, f);
        fwrite(&s->ids[i], 1, 4, f);
    }
    fwrite(&s->layer_min_depth, 1, 4, f);
    uint64_t tn = s->layer_keys.size();
    fwrite(&tn, 1, 8, f);
    for (uint64_t i = 0; i < tn; i++) {
        fwrite(&s->layer_keys[i], 1, 8, f);
        fwrite(&s->layer_ids[i], 1, 4, f);
    }
    fwrite(&s->layer_sorted, 1, 1, f);
    uint64_t cn = s->collisions.size();
    fwrite(&cn, 1, 8, f);
    for (uint64_t i = 0; i < cn; i++) {
        uint32_t ab[2] = {(uint32_t)(s->collisions[i] >> 32),
                          (uint32_t)(s->collisions[i] & 0xFFFFFFFFu)};
        fwrite(ab, 1, 8, f);
    }
    uint64_t hn = s->hits.size();
    fwrite(&hn, 1, 8, f);
    if (hn) fwrite(s->hits.data(), 1, hn * 4, f);
    fwrite(&s->has_nearest, 1, 1, f);
    if (s->has_nearest) {
        fwrite(&s->nearest_id, 1, 4, f);
        fwrite(&s->nearest_dist, 1, 4, f);
    }
    int rc = ferror(f) ? -1 : 0;
    fclose(f);
    return rc;
}

void* bp_scene_new(const float* smin, const float* smax,
                   const float* bmin, const float* bmax,
                   const uint32_t* ids, uint64_t n) {
    BpScene* s = new BpScene();
    memcpy(s->system_min, smin, 12);
    memcpy(s->system_max, smax, 12);
    s->bounds.resize(n * 6);
    s->ids.assign(ids, ids + n);
    for (uint64_t i = 0; i < n; i++) {
        memcpy(&s->bounds[6 * i], bmin + 3 * i, 12);
        memcpy(&s->bounds[6 * i + 3], bmax + 3 * i, 12);
    }
    return s;
}

void bp_scene_set_layer(void* sv, uint32_t min_depth, const uint64_t* keys,
                        const uint32_t* ids, uint64_t n, int sorted) {
    BpScene* s = (BpScene*)sv;
    s->layer_min_depth = min_depth;
    s->layer_keys.assign(keys, keys + n);
    s->layer_ids.assign(ids, ids + n);
    s->layer_sorted = sorted ? 1 : 0;
}

void bp_scene_set_collisions(void* sv, const uint64_t* pairs, uint64_t n) {
    BpScene* s = (BpScene*)sv;
    s->collisions.assign(pairs, pairs + n);
}

uint64_t bp_scene_object_count(const void* sv) {
    return ((const BpScene*)sv)->ids.size();
}

uint64_t bp_scene_tree_count(const void* sv) {
    return ((const BpScene*)sv)->layer_keys.size();
}

uint64_t bp_scene_collision_count(const void* sv) {
    return ((const BpScene*)sv)->collisions.size();
}

void bp_scene_get(const void* sv, float* smin, float* smax, float* bmin,
                  float* bmax, uint32_t* ids) {
    const BpScene* s = (const BpScene*)sv;
    memcpy(smin, s->system_min, 12);
    memcpy(smax, s->system_max, 12);
    uint64_t n = s->ids.size();
    for (uint64_t i = 0; i < n; i++) {
        memcpy(bmin + 3 * i, &s->bounds[6 * i], 12);
        memcpy(bmax + 3 * i, &s->bounds[6 * i + 3], 12);
    }
    memcpy(ids, s->ids.data(), n * 4);
}

void bp_scene_get_layer(const void* sv, uint32_t* min_depth, uint64_t* keys,
                        uint32_t* ids, uint8_t* sorted) {
    const BpScene* s = (const BpScene*)sv;
    *min_depth = s->layer_min_depth;
    memcpy(keys, s->layer_keys.data(), s->layer_keys.size() * 8);
    memcpy(ids, s->layer_ids.data(), s->layer_ids.size() * 4);
    *sorted = s->layer_sorted;
}

void bp_scene_get_collisions(const void* sv, uint64_t* pairs) {
    const BpScene* s = (const BpScene*)sv;
    memcpy(pairs, s->collisions.data(), s->collisions.size() * 8);
}

void bp_scene_free(void* sv) { delete (BpScene*)sv; }

}  // extern "C"
