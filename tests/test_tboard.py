"""TensorBoard event writer: crc vectors + write/read round-trip."""

import numpy as np

from k210_yolo_framework_tpu.utils.tboard import (SummaryWriter, _crc32c,
                                                  _masked_crc, read_events)


def test_crc32c_known_vectors():
    # canonical Castagnoli test vectors
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_round_trip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 12.5, step=1)
    w.add_scalars([("loss", 10.0), ("p", 0.25)], step=2)
    w.close()

    events = list(read_events(w.path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1 and events[1]["scalars"] == {"loss": 12.5}
    assert events[2]["step"] == 2
    np.testing.assert_allclose(events[2]["scalars"]["p"], 0.25)
    assert events[2]["scalars"]["loss"] == 10.0


def test_crc_detects_corruption(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=1)
    w.close()
    raw = bytearray(open(w.path, "rb").read())
    raw[-6] ^= 0xFF  # flip a payload byte
    bad = tmp_path / "bad"
    bad.write_bytes(bytes(raw))
    try:
        list(read_events(str(bad)))
        assert False, "corruption not detected"
    except AssertionError as e:
        assert "crc" in str(e) or "corruption not detected" not in str(e)
