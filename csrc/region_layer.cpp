// Native region layer: YOLO decode + per-class greedy NMS on the host CPU.
//
// C++ counterpart of the reference firmware's region layer
// (/root/reference/yolo3_frame_test_public/region_layer.c:84-283): the K210
// runs the conv stack on its KPU accelerator and decodes on the CPU.  Our
// TPU serving path keeps decode+NMS on the accelerator (ops/nms_pallas.py),
// so this library serves as (a) the host-side fallback when no accelerator
// is attached and (b) a cross-language parity oracle for the device kernels.
//
// Math matches the canonical TF decode (tools/utils.py:524-547,
// keras_inference.py:32-72, 94-131):
//   xy    = (sigmoid(txy) + grid_offset) / grid_wh        (per layer)
//   wh    = exp(twh) * anchor_wh                          (normalized)
//   score = sigmoid(cls) * sigmoid(conf)        [or softmax(cls) * sigmoid
//           (conf) with class_softmax=1 — the firmware flavor,
//           region_layer.c:91-136]
//   boxes -> letterbox-inverse -> yxyx pixels in the ORIGINAL image
//   per class: greedy NMS, IoU > iou_thresh suppressed, <= max_out kept.
//
// Layout: predictions are HWC [h, w, anchors, 5+classes] float32 — the
// framework's native layer output (the firmware walks CHW via entry_index;
// that difference is layout-only, the math is identical).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

struct Cand {
  float y0, x0, y1, x1;
  float score;
  int cls;
};

inline float iou_yxyx(const Cand& a, const Cand& b) {
  float ymin = std::max(a.y0, b.y0), xmin = std::max(a.x0, b.x0);
  float ymax = std::min(a.y1, b.y1), xmax = std::min(a.x1, b.x1);
  float inter = std::max(ymax - ymin, 0.0f) * std::max(xmax - xmin, 0.0f);
  float a1 = std::max(a.y1 - a.y0, 0.0f) * std::max(a.x1 - a.x0, 0.0f);
  float a2 = std::max(b.y1 - b.y0, 0.0f) * std::max(b.x1 - b.x0, 0.0f);
  float u = a1 + a2 - inter;
  return u > 0 ? inter / u : 0.0f;
}

}  // namespace

extern "C" {

// preds:      n_layers pointers, layer l shaped [h_l, w_l, anchors, 5+classes]
// grid_hw:    [n_layers * 2] (h, w per layer)
// anchor_wh:  [n_layers * anchors * 2] normalized (w, h) — anchor npy layout
// outputs:    fixed [classes * max_out] slots (class-major, score-descending)
// Returns the number of valid detections.
int yl_region_layer_run(const float* const* preds, const int32_t* grid_hw,
                        int n_layers, int anchors, int classes,
                        const float* anchor_wh, int in_h, int in_w,
                        int img_h, int img_w, float obj_thresh,
                        float iou_thresh, int max_out, int class_softmax,
                        float* out_boxes, float* out_scores,
                        int32_t* out_classes, uint8_t* out_valid) {
  // letterbox-inverse factors (keras_inference.py:32-72; note the reference
  // ROUNDS the resized shape here even though the forward pad truncates)
  const float scale = std::min((float)in_w / img_w, (float)in_h / img_h);
  // clamp: a degenerate aspect ratio can round the resized extent to 0,
  // which would divide to inf and emit NaN "detections"
  const float new_w = std::max(1.0f, std::round(img_w * scale));
  const float new_h = std::max(1.0f, std::round(img_h * scale));
  const float off_x = (in_w - new_w) / 2.0f / in_w;   // normalized offsets
  const float off_y = (in_h - new_h) / 2.0f / in_h;
  const float sx = (float)in_w / new_w, sy = (float)in_h / new_h;

  std::vector<std::vector<Cand>> per_class(classes);
  std::vector<float> cls_prob(classes);

  for (int l = 0; l < n_layers; ++l) {
    const int gh = grid_hw[2 * l], gw = grid_hw[2 * l + 1];
    const float* p = preds[l];
    const int stride_a = 5 + classes;
    for (int gy = 0; gy < gh; ++gy) {
      for (int gx = 0; gx < gw; ++gx) {
        for (int a = 0; a < anchors; ++a) {
          const float* e =
              p + (((size_t)gy * gw + gx) * anchors + a) * stride_a;
          const float conf = sigmoidf(e[4]);
          // objectness gate: cls_prob <= 1, so score = cls_prob * conf can
          // never reach obj_thresh when conf is already below it — skipping
          // here is lossless and avoids ~n_classes transcendentals per cell
          // (the firmware gates the same way, region_layer.c:195-210)
          if (conf < obj_thresh) continue;
          // decode to normalized net coords (tools/utils.py:524-547)
          float cx = (sigmoidf(e[0]) + gx) / gw;
          float cy = (sigmoidf(e[1]) + gy) / gh;
          float bw = std::exp(e[2]) * anchor_wh[(l * anchors + a) * 2 + 0];
          float bh = std::exp(e[3]) * anchor_wh[(l * anchors + a) * 2 + 1];
          // letterbox inverse -> original-image pixel yxyx
          float ox = (cx - off_x) * sx, oy = (cy - off_y) * sy;
          float ow = bw * sx, oh = bh * sy;
          float y0 = (oy - oh / 2) * img_h, x0 = (ox - ow / 2) * img_w;
          float y1 = (oy + oh / 2) * img_h, x1 = (ox + ow / 2) * img_w;

          if (class_softmax) {  // region_layer.c:91-136 firmware flavor
            float m = e[5];
            for (int c = 1; c < classes; ++c) m = std::max(m, e[5 + c]);
            float sum = 0;
            for (int c = 0; c < classes; ++c) {
              cls_prob[c] = std::exp(e[5 + c] - m);
              sum += cls_prob[c];
            }
            for (int c = 0; c < classes; ++c) cls_prob[c] /= sum;
          } else {  // canonical TF flavor (keras_inference.py:101)
            for (int c = 0; c < classes; ++c) cls_prob[c] = sigmoidf(e[5 + c]);
          }
          for (int c = 0; c < classes; ++c) {
            float s = cls_prob[c] * conf;
            if (s >= obj_thresh)
              per_class[c].push_back({y0, x0, y1, x1, s, c});
          }
        }
      }
    }
  }

  // per-class greedy NMS (keras_inference.py:118-131 / region_layer.c:216-283)
  int total = 0;
  for (int c = 0; c < classes; ++c) {
    auto& cands = per_class[c];
    std::stable_sort(cands.begin(), cands.end(),
                     [](const Cand& a, const Cand& b) { return a.score > b.score; });
    std::vector<Cand> kept;
    for (const auto& cand : cands) {
      if ((int)kept.size() >= max_out) break;
      bool ok = true;
      for (const auto& k : kept)
        if (iou_yxyx(cand, k) > iou_thresh) { ok = false; break; }
      if (ok) kept.push_back(cand);
    }
    for (int m = 0; m < max_out; ++m) {
      const int o = c * max_out + m;
      if (m < (int)kept.size()) {
        out_boxes[4 * o + 0] = kept[m].y0;
        out_boxes[4 * o + 1] = kept[m].x0;
        out_boxes[4 * o + 2] = kept[m].y1;
        out_boxes[4 * o + 3] = kept[m].x1;
        out_scores[o] = kept[m].score;
        out_classes[o] = c;
        out_valid[o] = 1;
        ++total;
      } else {
        out_boxes[4 * o + 0] = out_boxes[4 * o + 1] = 0;
        out_boxes[4 * o + 2] = out_boxes[4 * o + 3] = 0;
        out_scores[o] = 0;
        out_classes[o] = c;
        out_valid[o] = 0;
      }
    }
  }
  return total;
}

}  // extern "C"
