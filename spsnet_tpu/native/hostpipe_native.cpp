// Native host data-pipeline kernels.
//
// The training loader's per-scene cost is dominated by a handful of
// per-point passes over the raw scan (~120k points on KITTI): points-in-
// rotated-boxes (gt-sampler carve-out + fake semantic labels), the camera
// FOV mask, the range crop, the near/far depth split, and the gt-sampler's
// rotated BEV IoU rejection. The reference runs these through CUDA or
// numpy; here they are single-pass C++ loops loaded via ctypes (see
// ``hostpipe.py``), each a drop-in twin of the numpy implementation in
// ``data/processor/data_processor.py`` / ``data/kitti/kitti_dataset.py`` /
// ``data/augmentor/data_augmentor_geometry.py``.
//
// Float discipline: kernels that gate data selection (points_in_boxes,
// range mask, near mask) replicate the numpy float32 operation order
// exactly and must be compiled with -ffp-contract=off so results are
// bit-identical to the numpy fallback (enforced by tests). The FOV mask
// involves a 4-term dot product whose summation order inside numpy's BLAS
// sgemm is unspecified; it uses sequential float32 and the parity test is
// boundary-tolerant. bev_iou runs the polygon clip in double like numpy.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// (n, stride) float32 points x (t, 7) boxes -> (t, n) int32 indicator.
// Twin of data_processor._points_in_boxes_exact (the candidate prefilter in
// points_in_boxes_cpu_np is an optimization whose output equals the exact
// test everywhere; here the exact test is cheap enough to run branchless on
// every (box, point) pair). cosa/sina are passed in, precomputed by numpy
// (np.cos(-rz)) so trig rounding matches the fallback bit-for-bit.
void points_in_boxes(const float* pts, int64_t n, int64_t stride,
                     const float* boxes, int64_t t,
                     const float* cosa, const float* sina, int32_t* out) {
    for (int64_t b = 0; b < t; ++b) {
        const float bx = boxes[b * 7 + 0];
        const float by = boxes[b * 7 + 1];
        const float bz = boxes[b * 7 + 2];
        const float hx = boxes[b * 7 + 3] * 0.5f + 1e-5f;
        const float hy = boxes[b * 7 + 4] * 0.5f + 1e-5f;
        const float hz = boxes[b * 7 + 5] * 0.5f;  // z uses <=, no margin
        const float ca = cosa[b];
        const float sa = sina[b];
        int32_t* o = out + b * n;
        for (int64_t i = 0; i < n; ++i) {
            const float sx = pts[i * stride + 0] - bx;
            const float sy = pts[i * stride + 1] - by;
            const float sz = pts[i * stride + 2] - bz;
            const float lx = sx * ca - sy * sa;
            const float ly = sx * sa + sy * ca;
            o[i] = (std::fabs(sz) <= hz) & (std::fabs(lx) < hx) &
                   (std::fabs(ly) < hy);
        }
    }
}

// Camera-FOV mask, twin of KittiDataset.get_fov_flag: hom lidar point
// through m1 = (V2C.T @ R0.T) to rect coords, hom rect through p2t = P2.T
// to image coords (divided by rect z), in-image test plus depth >= 0.
// m1/p2t are (4, 3) float32 row-major; p2_23 = P2[2, 3].
void fov_mask(const float* pts, int64_t n, int64_t stride,
              const float* m1, const float* p2t, float p2_23,
              float img_h, float img_w, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * stride + 0];
        const float y = pts[i * stride + 1];
        const float z = pts[i * stride + 2];
        float rect[3];
        for (int j = 0; j < 3; ++j)
            rect[j] = x * m1[0 + j] + y * m1[3 + j] + z * m1[6 + j] +
                      m1[9 + j];
        float img[3];
        for (int j = 0; j < 3; ++j)
            img[j] = rect[0] * p2t[0 + j] + rect[1] * p2t[3 + j] +
                     rect[2] * p2t[6 + j] + p2t[9 + j];
        const float u = img[0] / rect[2];
        const float v = img[1] / rect[2];
        const float depth = img[2] - p2_23;
        out[i] = (u >= 0.0f) & (u < img_w) & (v >= 0.0f) & (v < img_h) &
                 (depth >= 0.0f);
    }
}

// x/y range crop, twin of DataProcessor.mask_points_and_boxes_outside_range:
// pcr = [x0, y0, z0, x1, y1, z1]; keeps x in [x0, x1], y in [y0, y1].
void range_xy_mask(const float* pts, int64_t n, int64_t stride,
                   const float* pcr, uint8_t* out) {
    const float x0 = pcr[0], y0 = pcr[1], x1 = pcr[3], y1 = pcr[4];
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * stride + 0];
        const float y = pts[i * stride + 1];
        out[i] = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1);
    }
}

// depth < thresh mask, twin of sample_points' near/far split:
// np.linalg.norm(points[:, 0:3], axis=1) < 40.0 in float32.
void near_mask(const float* pts, int64_t n, int64_t stride, float thresh,
               uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * stride + 0];
        const float y = pts[i * stride + 1];
        const float z = pts[i * stride + 2];
        out[i] = std::sqrt((x * x + y * y) + z * z) < thresh;
    }
}

// First-hit variant: (n,) int32 index of the lowest-index box containing
// each point, -1 if none — equals argmax over the (t, n) indicator without
// materializing it (the indicator is ~20 MB at scan scale; its allocation
// and the downstream sum/argmax passes dominated the native points_in_boxes
// call). Chunked so the output tile stays cache-resident across the box
// loop. Same exact per-box test as points_in_boxes.
void points_first_box(const float* pts, int64_t n, int64_t stride,
                      const float* boxes, int64_t t,
                      const float* cosa, const float* sina, int32_t* out) {
    constexpr int64_t CHUNK = 2048;
    for (int64_t c0 = 0; c0 < n; c0 += CHUNK) {
        const int64_t c1 = c0 + CHUNK < n ? c0 + CHUNK : n;
        for (int64_t i = c0; i < c1; ++i) out[i] = -1;
        for (int64_t b = 0; b < t; ++b) {
            const float bx = boxes[b * 7 + 0];
            const float by = boxes[b * 7 + 1];
            const float bz = boxes[b * 7 + 2];
            const float hx = boxes[b * 7 + 3] * 0.5f + 1e-5f;
            const float hy = boxes[b * 7 + 4] * 0.5f + 1e-5f;
            const float hz = boxes[b * 7 + 5] * 0.5f;
            const float ca = cosa[b];
            const float sa = sina[b];
            for (int64_t i = c0; i < c1; ++i) {
                const float sx = pts[i * stride + 0] - bx;
                const float sy = pts[i * stride + 1] - by;
                const float sz = pts[i * stride + 2] - bz;
                const float lx = sx * ca - sy * sa;
                const float ly = sx * sa + sy * ca;
                const bool in = (std::fabs(sz) <= hz) & (std::fabs(lx) < hx) &
                                (std::fabs(ly) < hy);
                out[i] = (out[i] < 0 && in) ? (int32_t)b : out[i];
            }
        }
    }
}

// In-place world transforms (augmentor fast paths). cos/sin/scale arrive
// as float32 computed by numpy so rounding matches the numpy twins exactly
// (see augmentor_utils.py: rotation is x*c + y*(-s) which equals x*c - y*s
// bit-for-bit; scaling casts the python-float scale to f32 under NEP50).
void rot_z_inplace(float* pts, int64_t n, int64_t stride,
                   float c, float s) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * stride + 0];
        const float y = pts[i * stride + 1];
        pts[i * stride + 0] = x * c - y * s;
        pts[i * stride + 1] = x * s + y * c;
    }
}

// scale is double and the product is computed in double then rounded,
// matching numpy's ``f32_array *= np.float64_scalar`` promotion (NEP 50:
// the float64 scalar is strong, so numpy computes in f64 and casts back).
void scale_xyz_inplace(float* pts, int64_t n, int64_t stride, double s) {
    for (int64_t i = 0; i < n; ++i) {
        pts[i * stride + 0] = (float)((double)pts[i * stride + 0] * s);
        pts[i * stride + 1] = (float)((double)pts[i * stride + 1] * s);
        pts[i * stride + 2] = (float)((double)pts[i * stride + 2] * s);
    }
}

void negate_col_inplace(float* pts, int64_t n, int64_t stride, int64_t col) {
    for (int64_t i = 0; i < n; ++i)
        pts[i * stride + col] = -pts[i * stride + col];
}

// ---- rotated BEV IoU (gt-sampler collision rejection) ----------------
// Twin of data_augmentor_geometry.boxes_bev_iou_cpu: Sutherland-Hodgman
// polygon clip in double, shoelace area, IoU with a 1e-6 denominator floor.

namespace {

struct P2d { double x, y; };

inline void bev_corners(const float* box, P2d c[4]) {
    const double dx = box[3] * 0.5, dy = box[4] * 0.5;
    const double cc = std::cos((double)box[6]), ss = std::sin((double)box[6]);
    const double tpl[4][2] = {{dx, dy}, {-dx, dy}, {-dx, -dy}, {dx, -dy}};
    for (int k = 0; k < 4; ++k) {
        c[k].x = tpl[k][0] * cc - tpl[k][1] * ss + box[0];
        c[k].y = tpl[k][0] * ss + tpl[k][1] * cc + box[1];
    }
}

// clip poly (npoly pts) against half-plane left of edge e1->e2; Sutherland-
// Hodgman emits at most 2 points per input vertex. Buffers sized 16 (a
// quad clipped by a quad has <= 8 vertices).
inline int clip_edge(const P2d* poly, int npoly, P2d e1, P2d e2, P2d* out) {
    const double dx = e2.x - e1.x, dy = e2.y - e1.y;
    int m = 0;
    for (int i = 0; i < npoly; ++i) {
        const P2d cur = poly[i], nxt = poly[(i + 1) % npoly];
        const double fc = dx * (cur.y - e1.y) - dy * (cur.x - e1.x);
        const double fn = dx * (nxt.y - e1.y) - dy * (nxt.x - e1.x);
        if (fc >= 0) out[m++] = cur;
        if ((fc >= 0) != (fn >= 0)) {
            const double s = fc / (fc - fn);
            out[m++] = {cur.x + s * (nxt.x - cur.x),
                        cur.y + s * (nxt.y - cur.y)};
        }
    }
    return m;
}

inline double overlap_area(const P2d ca[4], const P2d cb[4]) {
    P2d buf_a[16], buf_b[16];
    const P2d* poly = ca;
    P2d* cur = buf_a;
    P2d* nxt = buf_b;
    int m = 4;
    for (int k = 0; k < 4; ++k) {
        m = clip_edge(poly, m, cb[k], cb[(k + 1) % 4], cur);
        if (m == 0) return 0.0;
        poly = cur;
        P2d* tmp = cur; cur = nxt; nxt = tmp;
    }
    if (m < 3) return 0.0;
    double a = 0.0;
    for (int i = 0; i < m; ++i) {
        const P2d& p = poly[i];
        const P2d& q = poly[(i + 1) % m];
        a += p.x * q.y - p.y * q.x;
    }
    return 0.5 * std::fabs(a);
}

}  // namespace

void bev_iou(const float* ba, int64_t n, const float* bb, int64_t m,
             float* out) {
    for (int64_t i = 0; i < n; ++i) {
        P2d ca[4];
        bev_corners(ba + i * 7, ca);
        double alo_x = ca[0].x, ahi_x = ca[0].x;
        double alo_y = ca[0].y, ahi_y = ca[0].y;
        for (int k = 1; k < 4; ++k) {
            alo_x = std::fmin(alo_x, ca[k].x); ahi_x = std::fmax(ahi_x, ca[k].x);
            alo_y = std::fmin(alo_y, ca[k].y); ahi_y = std::fmax(ahi_y, ca[k].y);
        }
        const double area_a = (double)ba[i * 7 + 3] * ba[i * 7 + 4];
        for (int64_t j = 0; j < m; ++j) {
            P2d cb[4];
            bev_corners(bb + j * 7, cb);
            double blo_x = cb[0].x, bhi_x = cb[0].x;
            double blo_y = cb[0].y, bhi_y = cb[0].y;
            for (int k = 1; k < 4; ++k) {
                blo_x = std::fmin(blo_x, cb[k].x);
                bhi_x = std::fmax(bhi_x, cb[k].x);
                blo_y = std::fmin(blo_y, cb[k].y);
                bhi_y = std::fmax(bhi_y, cb[k].y);
            }
            float iou = 0.0f;
            if (!(ahi_x < blo_x || bhi_x < alo_x ||
                  ahi_y < blo_y || bhi_y < alo_y)) {
                const double ov = overlap_area(ca, cb);
                const double area_b = (double)bb[j * 7 + 3] * bb[j * 7 + 4];
                double denom = area_a + area_b - ov;
                if (denom < 1e-6) denom = 1e-6;
                iou = (float)(ov / denom);
            }
            out[i * m + j] = iou;
        }
    }
}

}  // extern "C"
