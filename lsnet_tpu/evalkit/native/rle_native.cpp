// Native RLE mask kernels for the eval backend.
//
// Role-equivalent of the reference's C mask core
// (/root/reference/code/cocoapi/pycocotools/common/maskApi.c) but written
// against a different representation: foreground runs as (start, end)
// interval arrays in column-major flat order, batched CSR-style so one
// call computes a whole D x G IoU matrix (the COCOeval hot loop).
//
// Build: g++ -O3 -shared -fPIC rle_native.cpp -o librle_native.so
// Bound via ctypes (see lsnet_tpu/evalkit/native_rle.py).

#include <cstdint>
#include <algorithm>

extern "C" {

// Intersection size of two sorted interval lists.
int64_t interval_intersection(const int64_t* sa, const int64_t* ea, int64_t na,
                              const int64_t* sb, const int64_t* eb, int64_t nb) {
    int64_t i = 0, j = 0, inter = 0;
    while (i < na && j < nb) {
        int64_t lo = std::max(sa[i], sb[j]);
        int64_t hi = std::min(ea[i], eb[j]);
        if (hi > lo) inter += hi - lo;
        if (ea[i] < eb[j]) ++i; else ++j;
    }
    return inter;
}

// D x G IoU matrix over interval-encoded masks.
//
// starts/ends: concatenated interval arrays for all masks.
// offs[k], lens[k]: slice of mask k within starts/ends.
// areas[k]: precomputed foreground area of mask k.
// d_idx[D], g_idx[G]: mask ids of detections / ground truths.
// iscrowd[G]: crowd GT => IoU = inter / det_area.
// out: row-major D x G.
void rle_iou_matrix(const int64_t* starts, const int64_t* ends,
                    const int64_t* offs, const int64_t* lens,
                    const int64_t* areas,
                    int64_t D, int64_t G,
                    const int64_t* d_idx, const int64_t* g_idx,
                    const uint8_t* iscrowd, double* out) {
    for (int64_t d = 0; d < D; ++d) {
        const int64_t kd = d_idx[d];
        const int64_t* sa = starts + offs[kd];
        const int64_t* ea = ends + offs[kd];
        const int64_t na = lens[kd];
        const double ad = (double)areas[kd];
        for (int64_t g = 0; g < G; ++g) {
            const int64_t kg = g_idx[g];
            int64_t inter = interval_intersection(
                sa, ea, na, starts + offs[kg], ends + offs[kg], lens[kg]);
            double uni = iscrowd[g] ? ad
                                    : ad + (double)areas[kg] - (double)inter;
            out[d * G + g] = uni > 0 ? (double)inter / uni : 0.0;
        }
    }
}

// Decode interval runs into a dense uint8 mask (column-major flat).
void intervals_decode(const int64_t* s, const int64_t* e, int64_t n,
                      uint8_t* out, int64_t total) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t lo = s[i] < 0 ? 0 : s[i];
        int64_t hi = e[i] > total ? total : e[i];
        for (int64_t p = lo; p < hi; ++p) out[p] = 1;
    }
}

}  // extern "C"
