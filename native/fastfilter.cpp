// fastfilter: native kernels for the curve acceptance filter's hot loops.
//
// The decode+filter stage of the generation pipeline runs the geometric
// checks on the host while the TPU decodes the next batch. The two
// quadratic checks — point self-collision (O(L^2)) and segment-segment
// clash via sampled points (O(L^2 * S^2)) — dominate host time at L=350.
// (Reference behavior: scripts/run_aeot_end2end.py:325-371; the reference
// ran these as Python loops.)
//
// Exposed as a C ABI for ctypes (no pybind11 in this image):
//   ff_point_collisions(coords, L, min_dist, neighbor_exclude) -> count
//   ff_segment_clashes(coords, L, min_seg_dist, excl, n_samples) -> count
//   ff_filter_batch(...) runs both for a padded batch of curves.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>

extern "C" {

// coords: [L, 3] float32 row-major
int64_t ff_point_collisions(const float* coords, int64_t L,
                            float min_dist, int64_t neighbor_exclude) {
    if (L <= neighbor_exclude + 1) return 0;
    const float t2 = min_dist * min_dist;
    int64_t count = 0;
    for (int64_t i = 0; i < L; ++i) {
        const float xi = coords[3 * i], yi = coords[3 * i + 1],
                    zi = coords[3 * i + 2];
        for (int64_t j = i + neighbor_exclude + 1; j < L; ++j) {
            const float dx = xi - coords[3 * j];
            const float dy = yi - coords[3 * j + 1];
            const float dz = zi - coords[3 * j + 2];
            if (dx * dx + dy * dy + dz * dz < t2) ++count;
        }
    }
    // the reference counts ordered pairs both ways (full matrix sum,
    // run_aeot_end2end.py:325-334)
    return 2 * count;
}

int64_t ff_segment_clashes(const float* coords, int64_t L,
                           float min_seg_dist, int64_t neighbor_exclude,
                           int64_t n_samples) {
    if (L < 3) return 0;
    const int64_t n_seg = L - 1;
    const float t2 = min_seg_dist * min_seg_dist;
    int64_t count = 0;
    // sampled points per segment: p0 + t*(p1-p0), t in linspace(0,1,S)
    for (int64_t i = 0; i < n_seg; ++i) {
        const float* p0 = coords + 3 * i;
        const float* p1 = coords + 3 * (i + 1);
        for (int64_t j = i + 1 + neighbor_exclude; j < n_seg; ++j) {
            const float* q0 = coords + 3 * j;
            const float* q1 = coords + 3 * (j + 1);
            // cheap reject: bounding-sphere distance between midpoints
            const float mx = 0.5f * (p0[0] + p1[0]) - 0.5f * (q0[0] + q1[0]);
            const float my = 0.5f * (p0[1] + p1[1]) - 0.5f * (q0[1] + q1[1]);
            const float mz = 0.5f * (p0[2] + p1[2]) - 0.5f * (q0[2] + q1[2]);
            const float dpx = p1[0] - p0[0], dpy = p1[1] - p0[1],
                        dpz = p1[2] - p0[2];
            const float dqx = q1[0] - q0[0], dqy = q1[1] - q0[1],
                        dqz = q1[2] - q0[2];
            const float rp = 0.5f * std::sqrt(dpx * dpx + dpy * dpy
                                              + dpz * dpz);
            const float rq = 0.5f * std::sqrt(dqx * dqx + dqy * dqy
                                              + dqz * dqz);
            const float md = std::sqrt(mx * mx + my * my + mz * mz);
            if (md > rp + rq + min_seg_dist) continue;
            bool hit = false;
            for (int64_t a = 0; a < n_samples && !hit; ++a) {
                const float ta = n_samples > 1
                    ? (float)a / (float)(n_samples - 1) : 0.0f;
                const float ax = p0[0] + dpx * ta;
                const float ay = p0[1] + dpy * ta;
                const float az = p0[2] + dpz * ta;
                for (int64_t b = 0; b < n_samples; ++b) {
                    const float tb = n_samples > 1
                        ? (float)b / (float)(n_samples - 1) : 0.0f;
                    const float dx = ax - (q0[0] + dqx * tb);
                    const float dy = ay - (q0[1] + dqy * tb);
                    const float dz = az - (q0[2] + dqz * tb);
                    if (dx * dx + dy * dy + dz * dz < t2) { hit = true;
                                                           break; }
                }
            }
            if (hit) ++count;
        }
    }
    return count;
}

// Batch form: curves [B, Lmax, 3] f32, lengths [B] int64;
// writes point_counts [B] and seg_counts [B].
void ff_filter_batch(const float* curves, const int64_t* lengths,
                     int64_t B, int64_t Lmax,
                     float min_dist, int64_t neighbor_exclude,
                     float min_seg_dist, int64_t seg_excl,
                     int64_t n_samples,
                     int64_t* point_counts, int64_t* seg_counts) {
    for (int64_t b = 0; b < B; ++b) {
        const float* c = curves + b * Lmax * 3;
        const int64_t L = lengths[b];
        point_counts[b] = ff_point_collisions(c, L, min_dist,
                                              neighbor_exclude);
        seg_counts[b] = ff_segment_clashes(c, L, min_seg_dist, seg_excl,
                                           n_samples);
    }
}

}  // extern "C"
