"""Ground-truth weight porting: real tf.keras-written h5 files.

The synthetic tests in test_port.py construct their "reference" h5 from the
port maps themselves, so a wrong guess about Keras's creation-order
auto-numbering would validate itself.  Here the four reference graphs are
rebuilt with vanilla tf.keras (tests/tf_oracle.py) in the reference's exact
creation order, so **Keras assigns the layer names**; we save a genuine
``model.save(...h5)`` file, port it, and assert

  (a) every mapped layer is found (``missing == []``), and
  (b) our model's forward pass on the ported weights matches the tf.keras
      model's forward pass (inference mode, randomized weights incl. BN
      statistics) to ~1e-4.

This pins the headline reference capability "reuse shipped .h5 checkpoints"
(/root/reference/README.md:57-73, models/yolonet.py:16-21) end to end.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from k210_yolo_framework_tpu.models import build_network  # noqa: E402
from k210_yolo_framework_tpu.port import port_reference_h5  # noqa: E402

from tests import tf_oracle  # noqa: E402

pytestmark = pytest.mark.slow  # tf graph build + h5 round-trip per case


def _port_and_compare(tf_model, model_def, in_hw, tmp_path, alpha=1.0,
                      anchor_num=3, class_num=20):
    tf_oracle.randomize_weights(tf_model, seed=42)
    h5 = str(tmp_path / f"{model_def}.h5")
    tf_model.save(h5)

    import jax
    net = build_network(model_def, in_hw, anchor_num, class_num, alpha=alpha)
    v = net.init(jax.random.PRNGKey(0))
    template = {"params": v["params"], "batch_stats": v["batch_stats"]}
    ported, missing = port_reference_h5(h5, model_def, template)
    assert missing == [], f"port map layer names not found in real Keras h5: {missing}"

    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (2, in_hw[0], in_hw[1], 3)).astype(np.float32)
    tf_outs = tf_model(x, training=False)
    ours = net.apply_raw({"params": ported["params"],
                          "batch_stats": ported["batch_stats"]},
                         jnp.asarray(x), train=False)
    assert len(tf_outs) == len(ours)
    for i, (a, b) in enumerate(zip(tf_outs, ours)):
        a = np.asarray(a)
        b = np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        # tolerance scaled to the output magnitude: TF(oneDNN) vs XLA:CPU
        # differ by fp32 accumulation order (~1e-6 relative); a wrong port
        # would be O(1) relative.
        atol = 1e-4 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3,
                                   err_msg=f"output layer {i}")


def test_groundtruth_mobilev1_075(tmp_path):
    """Demo config: alpha=0.75 at 224x320 (README.md:61)."""
    m = tf_oracle.build_mobilev1((224, 320), alpha=0.75)
    _port_and_compare(m, "yolo_mobilev1", (224, 320), tmp_path, alpha=0.75)


def test_groundtruth_mobilev1_alpha1(tmp_path):
    """alpha=1.0 exercises the block-1 '40' K210 mod (keras_mobilenet.py:217)."""
    m = tf_oracle.build_mobilev1((96, 128), alpha=1.0)
    _port_and_compare(m, "yolo_mobilev1", (96, 128), tmp_path, alpha=1.0)


def test_groundtruth_mobilev2_075(tmp_path):
    """alpha=0.75 exercises the 48/124 expand caps (keras_mobilenet_v2.py:329-331)."""
    m = tf_oracle.build_mobilev2((96, 128), alpha=0.75)
    _port_and_compare(m, "yolo_mobilev2", (96, 128), tmp_path, alpha=0.75)


def test_groundtruth_mobilev2_alpha05(tmp_path):
    """alpha=0.5: no expand caps, make_divisible widths, 192-wide head."""
    m = tf_oracle.build_mobilev2((96, 128), alpha=0.5)
    _port_and_compare(m, "yolo_mobilev2", (96, 128), tmp_path, alpha=0.5)


def test_groundtruth_tiny_yolo(tmp_path):
    m = tf_oracle.build_tiny_yolo((96, 128))
    _port_and_compare(m, "tiny_yolo", (96, 128), tmp_path)


def test_groundtruth_yolo(tmp_path):
    m = tf_oracle.build_yolo((96, 96))
    _port_and_compare(m, "yolo", (96, 96), tmp_path)
