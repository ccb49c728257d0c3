// Native hot loops for the KITTI evaluator (replaces the reference's
// numba-CUDA rotate_iou + compute_statistics_jit with host C++).
//
// Exposed via a plain C ABI for ctypes. Box convention for the 2D rotated
// overlap: [cx, cy, w, h, angle] in the camera x-z plane (devkit layout).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libkitti_eval.so kitti_eval_native.cpp
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct Pt { double x, y; };

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// corners of [cx, cy, w, h, angle], CCW
inline void box_corners(const float* b, Pt out[4]) {
    static const double tmpl[4][2] = {{0.5, 0.5}, {-0.5, 0.5},
                                      {-0.5, -0.5}, {0.5, -0.5}};
    double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
    for (int i = 0; i < 4; ++i) {
        double lx = tmpl[i][0] * b[2], ly = tmpl[i][1] * b[3];
        out[i].x = lx * c - ly * s + b[0];
        out[i].y = lx * s + ly * c + b[1];
    }
}

// Sutherland-Hodgman clip of convex poly by half-plane left of e1->e2.
inline int clip_halfplane(const Pt* in, int n, Pt e1, Pt e2, Pt* out) {
    int m = 0;
    for (int i = 0; i < n; ++i) {
        Pt cur = in[i], nxt = in[(i + 1) % n];
        double fc = cross(e1, e2, cur);
        double fn = cross(e1, e2, nxt);
        if (fc >= 0) out[m++] = cur;
        if ((fc >= 0) != (fn >= 0)) {
            double t = fc / (fc - fn);
            out[m++] = {cur.x + t * (nxt.x - cur.x),
                        cur.y + t * (nxt.y - cur.y)};
        }
    }
    return m;
}

inline double poly_area(const Pt* p, int n) {
    if (n < 3) return 0.0;
    double a = 0.0;
    for (int i = 0; i < n; ++i) {
        int j = (i + 1) % n;
        a += p[i].x * p[j].y - p[j].x * p[i].y;
    }
    return std::abs(a) * 0.5;
}

inline double rotated_overlap(const float* ba, const float* bb) {
    Pt ca[4], cb[4];
    box_corners(ba, ca);
    box_corners(bb, cb);
    // AABB reject
    double axmin = 1e30, axmax = -1e30, aymin = 1e30, aymax = -1e30;
    double bxmin = 1e30, bxmax = -1e30, bymin = 1e30, bymax = -1e30;
    for (int i = 0; i < 4; ++i) {
        axmin = std::min(axmin, ca[i].x); axmax = std::max(axmax, ca[i].x);
        aymin = std::min(aymin, ca[i].y); aymax = std::max(aymax, ca[i].y);
        bxmin = std::min(bxmin, cb[i].x); bxmax = std::max(bxmax, cb[i].x);
        bymin = std::min(bymin, cb[i].y); bymax = std::max(bymax, cb[i].y);
    }
    if (axmax < bxmin || bxmax < axmin || aymax < bymin || bymax < aymin)
        return 0.0;
    Pt buf1[16], buf2[16];
    std::memcpy(buf1, ca, sizeof(ca));
    int n = 4;
    Pt* cur = buf1;
    Pt* nxt = buf2;
    for (int k = 0; k < 4 && n > 0; ++k) {
        n = clip_halfplane(cur, n, cb[k], cb[(k + 1) % 4], nxt);
        std::swap(cur, nxt);
    }
    return poly_area(cur, n);
}

}  // namespace

extern "C" {

// boxes (n, 5) x qboxes (k, 5) -> out (n, k); criterion: -1 union,
// 0/1 area a/b, else raw intersection area (devkit ua=1.0 branch)
void rotate_iou_eval(const float* boxes, int64_t n, const float* qboxes,
                     int64_t k, int criterion, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float* ba = boxes + i * 5;
        double area_a = (double)ba[2] * ba[3];
        for (int64_t j = 0; j < k; ++j) {
            const float* bb = qboxes + j * 5;
            double ov = rotated_overlap(ba, bb);
            double denom;
            if (criterion == -1) denom = area_a + (double)bb[2] * bb[3] - ov;
            else if (criterion == 0) denom = area_a;
            else if (criterion == 1) denom = (double)bb[2] * bb[3];
            else denom = 1.0;
            out[i * k + j] = (float)(ov / std::max(denom, 1e-8));
        }
    }
}

// camera boxes (n, 7) [x, y, z, l, h, w, ry], y = bottom; 3D IoU
void d3_box_overlap(const float* boxes, int64_t n, const float* qboxes,
                    int64_t k, int criterion, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float* a = boxes + i * 7;
        float bev_a[5] = {a[0], a[2], a[3], a[5], a[6]};
        double vol_a = (double)a[3] * a[4] * a[5];
        for (int64_t j = 0; j < k; ++j) {
            const float* b = qboxes + j * 7;
            float bev_b[5] = {b[0], b[2], b[3], b[5], b[6]};
            double ov = rotated_overlap(bev_a, bev_b);
            float val = 0.f;
            if (ov > 0) {
                double iw = std::min(a[1], b[1]) -
                            std::max(a[1] - a[4], b[1] - b[4]);
                if (iw > 0) {
                    double inter = ov * iw;
                    double vol_b = (double)b[3] * b[4] * b[5];
                    double denom;
                    if (criterion == -1) denom = vol_a + vol_b - inter;
                    else if (criterion == 0) denom = vol_a;
                    else denom = vol_b;
                    val = (float)(inter / std::max(denom, 1e-8));
                }
            }
            out[i * k + j] = val;
        }
    }
}

// One (image, threshold) statistics pass — the devkit compute_statistics_jit
// algorithm. Returns tp/fp/fn/similarity and, when compute_fp == 0, the tp
// score list (thresholds, out length in *n_thresh).
void compute_statistics(const float* overlaps,  // (det, gt) row-major
                        int64_t det_size, int64_t gt_size,
                        const float* gt_datas,   // (gt, 5) bbox4 + alpha
                        const float* dt_datas,   // (det, 6) bbox4+alpha+score
                        const int32_t* ignored_gt, const int32_t* ignored_det,
                        const float* dc_bboxes, int64_t num_dc,
                        int metric, double min_overlap, double thresh,
                        int compute_fp, int compute_aos,
                        int64_t* tp_out, int64_t* fp_out, int64_t* fn_out,
                        double* similarity_out,
                        float* thresholds_out, int64_t* n_thresh) {
    const double NO_DETECTION = -10000000.0;
    int64_t tp = 0, fp = 0, fn = 0;
    double similarity = 0.0;
    int64_t thresh_idx = 0, delta_idx = 0;
    bool* assigned = new bool[det_size > 0 ? det_size : 1]();
    bool* ignored_threshold = new bool[det_size > 0 ? det_size : 1]();
    double* delta = new double[gt_size > 0 ? gt_size : 1];
    for (int64_t j = 0; j < det_size; ++j)
        ignored_threshold[j] = dt_datas[j * 6 + 5] < thresh;

    for (int64_t i = 0; i < gt_size; ++i) {
        if (ignored_gt[i] == -1) continue;
        int64_t det_idx = -1;
        double valid_detection = NO_DETECTION;
        double max_overlap = 0.0;
        bool assigned_ignored_det = false;
        for (int64_t j = 0; j < det_size; ++j) {
            if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
                continue;
            double overlap = overlaps[j * gt_size + i];
            double dt_score = dt_datas[j * 6 + 5];
            if (!compute_fp && overlap > min_overlap &&
                dt_score > valid_detection) {
                det_idx = j;
                valid_detection = dt_score;
            } else if (compute_fp && overlap > min_overlap &&
                       (overlap > max_overlap || assigned_ignored_det) &&
                       ignored_det[j] == 0) {
                max_overlap = overlap;
                det_idx = j;
                valid_detection = 1;
                assigned_ignored_det = false;
            } else if (compute_fp && overlap > min_overlap &&
                       valid_detection == NO_DETECTION &&
                       ignored_det[j] == 1) {
                det_idx = j;
                valid_detection = 1;
                assigned_ignored_det = true;
            }
        }
        if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
            fn++;
        } else if (valid_detection != NO_DETECTION &&
                   (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
            assigned[det_idx] = true;
        } else if (valid_detection != NO_DETECTION) {
            tp++;
            thresholds_out[thresh_idx++] = dt_datas[det_idx * 6 + 5];
            if (compute_aos)
                delta[delta_idx++] = gt_datas[i * 5 + 4] -
                                     dt_datas[det_idx * 6 + 4];
            assigned[det_idx] = true;
        }
    }

    if (compute_fp) {
        for (int64_t j = 0; j < det_size; ++j) {
            if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
                  ignored_threshold[j]))
                fp++;
        }
        if (metric == 0 && num_dc > 0) {
            for (int64_t i = 0; i < num_dc; ++i) {
                const float* dc = dc_bboxes + i * 4;
                double dc_area = std::max(0.f, dc[2] - dc[0]) *
                                 std::max(0.f, dc[3] - dc[1]);
                for (int64_t j = 0; j < det_size; ++j) {
                    if (assigned[j] || ignored_det[j] == -1 ||
                        ignored_det[j] == 1 || ignored_threshold[j])
                        continue;
                    const float* db = dt_datas + j * 6;
                    double lx = std::max(db[0], dc[0]);
                    double ly = std::max(db[1], dc[1]);
                    double rx = std::min(db[2], dc[2]);
                    double ry = std::min(db[3], dc[3]);
                    double inter = std::max(0.0, rx - lx) *
                                   std::max(0.0, ry - ly);
                    double det_area = std::max(0.f, db[2] - db[0]) *
                                      std::max(0.f, db[3] - db[1]);
                    (void)dc_area;
                    double ov = inter / std::max(det_area, 1e-8);
                    if (ov > min_overlap) {
                        fp--;
                        assigned[j] = true;
                    }
                }
            }
        }
        if (compute_aos) {
            if (tp > 0 || fp > 0) {
                for (int64_t d = 0; d < delta_idx; ++d)
                    similarity += (1.0 + std::cos(delta[d])) / 2.0;
            } else {
                similarity = -1;
            }
        }
    }

    *tp_out = tp;
    *fp_out = fp;
    *fn_out = fn;
    *similarity_out = similarity;
    *n_thresh = thresh_idx;
    delete[] assigned;
    delete[] ignored_threshold;
    delete[] delta;
}

}  // extern "C"
