/* Native hard voxelizer (key-sorted fast path).
 *
 * C replacement for the numba voxelization kernels the reference runs in
 * its dataloader workers (det3d/ops/point_cloud/point_cloud_ops.py:8-111)
 * and for this package's vectorized-numpy port
 * (lidarseg3d_tpu/core/voxelize.py points_to_voxel sort_by_key=True).
 * Semantics are BYTE-IDENTICAL to the numpy sort_by_key path (asserted by
 * tests/test_voxelize.py::test_native_matches_numpy): voxels emitted in
 * ascending linear-key order, per-voxel points kept in scan order (stable
 * radix sort), truncation keeps the smallest keys past max_voxels.
 *
 * Built at import time by lidarseg3d_tpu/core/native_voxelize.py
 * (cc -O2 -shared -fPIC) and loaded via ctypes; no build system needed.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

/* stable LSD radix sort of (key, index) pairs by 32-bit key, 4x8-bit */
static void radix_sort_u32(uint32_t *keys, int32_t *idx, int64_t n,
                           uint32_t *tmp_keys, int32_t *tmp_idx) {
    int64_t count[256 + 1];
    for (int shift = 0; shift < 32; shift += 8) {
        memset(count, 0, sizeof(count));
        for (int64_t i = 0; i < n; ++i)
            count[((keys[i] >> shift) & 0xff) + 1]++;
        for (int b = 0; b < 256; ++b)
            count[b + 1] += count[b];
        for (int64_t i = 0; i < n; ++i) {
            int64_t pos = count[(keys[i] >> shift) & 0xff]++;
            tmp_keys[pos] = keys[i];
            tmp_idx[pos] = idx[i];
        }
        uint32_t *tk = keys; keys = tmp_keys; tmp_keys = tk;
        int32_t *ti = idx; idx = tmp_idx; tmp_idx = ti;
    }
    /* 4 passes: result already back in the original buffers */
}

/* returns number of voxels written, or -1 on allocation failure.
 * voxels_out must be zero-initialized by the caller. */
int64_t voxelize_sorted(const float *points, int64_t n, int64_t d,
                        const float *voxel_size, const float *coors_range,
                        int64_t max_points, int64_t max_voxels,
                        const int64_t *grid_size /* xyz */,
                        float *voxels_out, int32_t *coors_out,
                        int32_t *num_points_out) {
    if (n == 0) return 0;
    uint32_t *keys = malloc(sizeof(uint32_t) * n);
    int32_t *idx = malloc(sizeof(int32_t) * n);
    uint32_t *tkeys = malloc(sizeof(uint32_t) * n);
    int32_t *tidx = malloc(sizeof(int32_t) * n);
    if (!keys || !idx || !tkeys || !tidx) {
        free(keys); free(idx); free(tkeys); free(tidx);
        return -1;
    }
    const int64_t gx = grid_size[0], gy = grid_size[1], gz = grid_size[2];
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float *p = points + i * d;
        int64_t cx = (int64_t)floorf((p[0] - coors_range[0]) / voxel_size[0]);
        int64_t cy = (int64_t)floorf((p[1] - coors_range[1]) / voxel_size[1]);
        int64_t cz = (int64_t)floorf((p[2] - coors_range[2]) / voxel_size[2]);
        if (cx < 0 || cx >= gx || cy < 0 || cy >= gy || cz < 0 || cz >= gz)
            continue;
        keys[m] = (uint32_t)((cz * gy + cy) * gx + cx);
        idx[m] = (int32_t)i;
        ++m;
    }
    if (m == 0) {
        free(keys); free(idx); free(tkeys); free(tidx);
        return 0;
    }
    radix_sort_u32(keys, idx, m, tkeys, tidx);

    int64_t vox = -1;
    uint32_t prev_key = 0;
    int64_t rank = 0;
    for (int64_t i = 0; i < m; ++i) {
        if (vox < 0 || keys[i] != prev_key) {
            /* truncation keeps the smallest keys (sorted emission) */
            if (vox + 1 == max_voxels) break;
            ++vox;
            prev_key = keys[i];
            rank = 0;
            uint32_t k = keys[i];
            int32_t cz = (int32_t)(k / (uint32_t)(gy * gx));
            uint32_t rem = k % (uint32_t)(gy * gx);
            coors_out[vox * 3 + 0] = cz;
            coors_out[vox * 3 + 1] = (int32_t)(rem / (uint32_t)gx);
            coors_out[vox * 3 + 2] = (int32_t)(rem % (uint32_t)gx);
            num_points_out[vox] = 0;
        }
        if (rank < max_points) {
            memcpy(voxels_out + (vox * max_points + rank) * d,
                   points + (int64_t)idx[i] * d, sizeof(float) * d);
            num_points_out[vox] = (int32_t)(rank + 1);
        }
        ++rank;
    }
    free(keys); free(idx); free(tkeys); free(tidx);
    return vox + 1;
}
