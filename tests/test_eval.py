"""VOC mAP harness: AP math + end-to-end gt-as-predictions sanity."""

import numpy as np

from k210_yolo_framework_tpu.eval import (DetectionRecord, match_detections,
                                          voc_ap)


def test_voc_ap_perfect_curve():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    np.testing.assert_allclose(voc_ap(r, p, use_07_metric=True), 1.0)
    np.testing.assert_allclose(voc_ap(r, p, use_07_metric=False), 1.0)


def test_voc_ap_known_value():
    # one TP then one FP over 2 gt: recall [0.5, 0.5], precision [1.0, 0.5]
    r = np.array([0.5, 0.5])
    p = np.array([1.0, 0.5])
    # 11-pt: recall>=0..0.5 -> max p 1.0 (6 bins), rest 0 -> 6/11
    np.testing.assert_allclose(voc_ap(r, p, True), 6 / 11)
    np.testing.assert_allclose(voc_ap(r, p, False), 0.5)


def _box(y, x, s=20):
    return np.array([y, x, y + s, x + s], float)


def test_match_perfect_detections():
    rec = DetectionRecord(class_num=3)
    for img in range(4):
        gts = np.stack([_box(10 * img, 0), _box(100, 100)])
        cls = np.array([0, 1])
        rec.add_image(img, gts, np.array([0.9, 0.8]), cls, gts, cls)
    res = match_detections(rec)
    np.testing.assert_allclose(res["ap"][:2], [1.0, 1.0])
    assert np.isnan(res["ap"][2])  # class never in gt -> skipped
    np.testing.assert_allclose(res["map"], 1.0)


def test_match_duplicates_are_fps():
    rec = DetectionRecord(class_num=1)
    gt = _box(0, 0)[None]
    dets = np.stack([gt[0], gt[0] + 1.0])  # second is a duplicate hit
    rec.add_image(0, dets, np.array([0.9, 0.8]), np.zeros(2, int),
                  gt, np.zeros(1, int))
    res = match_detections(rec, use_07_metric=False)
    # recall curve: [1, 1], precision: [1, 0.5] -> all-points AP = 1.0
    np.testing.assert_allclose(res["map"], 1.0)
    # with the duplicate scored HIGHER, the true hit comes second
    rec2 = DetectionRecord(class_num=1)
    rec2.add_image(0, dets[::-1], np.array([0.9, 0.8]), np.zeros(2, int),
                   gt, np.zeros(1, int))
    res2 = match_detections(rec2, use_07_metric=False)
    np.testing.assert_allclose(res2["map"], 1.0)  # greedy still matches once


def test_missed_gt_lowers_recall():
    rec = DetectionRecord(class_num=1)
    gt = np.stack([_box(0, 0), _box(200, 200)])
    rec.add_image(0, _box(0, 0)[None], np.array([0.9]), np.zeros(1, int),
                  gt, np.zeros(2, int))
    res = match_detections(rec, use_07_metric=False)
    np.testing.assert_allclose(res["map"], 0.5)


def test_coco_sweep():
    from k210_yolo_framework_tpu.eval import match_detections_sweep
    rec = DetectionRecord(class_num=1)
    gt = _box(0, 0, s=40)[None]
    det = gt[0] + np.array([6.0, 6.0, 6.0, 6.0])  # shifted: IoU ~ 0.57
    rec.add_image(0, det[None], np.array([0.9]), np.zeros(1, int),
                  gt, np.zeros(1, int))
    res = match_detections_sweep(rec)
    per = res["map_per_iou"]
    assert per[0.5] == 1.0        # matched at IoU .5
    assert per[0.95] == 0.0       # unmatched at .95
    assert 0.0 < res["map"] < 1.0


def test_evaluate_map_with_gt_oracle(tmp_path):
    """Feed ground truth through a stub predictor -> mAP == 1."""
    from k210_yolo_framework_tpu.data.pipeline import synthetic_ann_list
    from k210_yolo_framework_tpu.eval import evaluate_map
    from k210_yolo_framework_tpu.inference import Detections

    ann = synthetic_ann_list(str(tmp_path), n=8, class_num=5, seed=4)

    class Oracle:
        def predict_batch(self, canvases, hws):
            out = []
            for k in range(canvases.shape[0]):
                h, w = hws[k]
                row = ann[self._base + k]
                gt = np.asarray(row[1], float)
                cy, cx = gt[:, 2] * h, gt[:, 1] * w
                bh, bw = gt[:, 4] * h, gt[:, 3] * w
                boxes = np.stack([cy - bh / 2, cx - bw / 2,
                                  cy + bh / 2, cx + bw / 2], 1)
                out.append(Detections(boxes, np.full(len(gt), 0.9),
                                      gt[:, 0].astype(int)))
            return out

    oracle = Oracle()
    calls = {"n": 0}

    def run():
        oracle._base = 0
        def patched(canvases, hws):
            res = Oracle.predict_batch(oracle, canvases, hws)
            oracle._base += canvases.shape[0]
            return res
        oracle.predict_batch = patched
        return evaluate_map(oracle, ann, class_num=5, batch_size=4)

    res = run()
    np.testing.assert_allclose(res["map"], 1.0)


def test_split_calibration_rows_holdout_is_disjoint():
    """No calib list -> the holdout comes off the eval tail, never overlaps."""
    from k210_yolo_framework_tpu.eval import split_calibration_rows

    ann = np.array([[f"img_{i}.jpg", None, None] for i in range(10)],
                   dtype=object)
    ev, cal = split_calibration_rows(ann, calib_size=3)
    assert [r[0] for r in cal] == ["img_7.jpg", "img_8.jpg", "img_9.jpg"]
    assert {r[0] for r in ev}.isdisjoint({r[0] for r in cal})
    assert len(ev) + len(cal) == len(ann)


def test_split_calibration_rows_explicit_list_keeps_eval_whole():
    from k210_yolo_framework_tpu.eval import split_calibration_rows

    ann = np.array([[f"e{i}", None, None] for i in range(4)], dtype=object)
    cal_src = np.array([[f"c{i}", None, None] for i in range(50)], dtype=object)
    ev, cal = split_calibration_rows(ann, cal_src, calib_size=8)
    assert len(ev) == 4 and len(cal) == 8
    assert all(str(r[0]).startswith("c") for r in cal)


def test_split_calibration_rows_rejects_short_calib_list():
    """An explicit list shorter than calib_size must raise, not silently
    calibrate on fewer rows (round-4 ADVICE item)."""
    import pytest

    from k210_yolo_framework_tpu.eval import split_calibration_rows

    ann = np.array([[f"e{i}", None, None] for i in range(4)], dtype=object)
    cal = np.array([[f"c{i}", None, None] for i in range(5)], dtype=object)
    with pytest.raises(ValueError, match="calib_size"):
        split_calibration_rows(ann, cal, calib_size=8)


def test_split_calibration_rows_rejects_eval_overlap():
    """Passing rows that overlap the eval list (worst case: the eval list
    itself) must raise — it would silently reintroduce the calibration
    data leak (round-4 ADVICE item)."""
    import pytest

    from k210_yolo_framework_tpu.eval import split_calibration_rows

    ann = np.array([[f"e{i}", None, None] for i in range(10)], dtype=object)
    with pytest.raises(ValueError, match="leak"):
        split_calibration_rows(ann, ann, calib_size=4)
    # one shared path is enough to raise
    mixed = np.array([["c0", None, None], ["e3", None, None],
                      ["c1", None, None], ["c2", None, None]], dtype=object)
    with pytest.raises(ValueError, match="leak"):
        split_calibration_rows(ann, mixed, calib_size=4)


def test_split_calibration_rows_rejects_tiny_eval_list():
    import pytest

    from k210_yolo_framework_tpu.eval import split_calibration_rows

    ann = np.array([[f"e{i}", None, None] for i in range(3)], dtype=object)
    with pytest.raises(ValueError, match="hold out"):
        split_calibration_rows(ann, calib_size=8)


def test_collect_detections_never_autocalibrates(tmp_path):
    """An UNcalibrated int8_act_cal predictor must raise out of eval (the
    round-3 behavior silently calibrated on the first EVAL batch — a
    calibration-data leak; nncase uses a separate `ncc --dataset`)."""
    import pytest

    from k210_yolo_framework_tpu.config import YoloSpec
    from k210_yolo_framework_tpu.data.pipeline import synthetic_ann_list
    from k210_yolo_framework_tpu.eval import collect_detections
    from k210_yolo_framework_tpu.inference import Predictor
    from k210_yolo_framework_tpu.models import build_network

    import jax

    ann = synthetic_ann_list(str(tmp_path), n=4, class_num=3, seed=0)
    anchors = np.array([[[0.5, 0.5], [0.4, 0.3], [0.2, 0.2]],
                        [[0.3, 0.3], [0.2, 0.2], [0.1, 0.1]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 3, anchors)
    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.5)
    variables = net.init(jax.random.PRNGKey(0))
    pred = Predictor(net, variables, spec, quantize="int8_act_cal")
    with pytest.raises(RuntimeError, match="calibrate"):
        collect_detections(pred, ann, 3, batch_size=4)
