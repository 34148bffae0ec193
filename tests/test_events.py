"""TensorBoard event writer, image grids, module summary (runtime/events.py).

Parity: reference TensorBoard logging (setgan/training_loop.py:349-362,
coach_restyle_psp.py:277-319) and print_module_summary
(torch_utils/misc.py:198)."""

import struct

import numpy as np

from stylegan3_editing_tpu.runtime.events import (
    EventWriter, crc32c, make_grid, module_summary, save_image_grid,
    _masked_crc)


def test_crc32c_vectors():
    # Known Castagnoli vectors.
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)
    return records


def test_event_writer_tfrecord_framing(tmp_path):
    w = EventWriter(tmp_path)
    w.scalar("loss", 0.5, step=3)
    w.image("img", np.zeros((8, 8, 3), np.uint8), step=3)
    w.close()
    records = _read_records(w.path)
    assert len(records) == 3  # header + scalar + image
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1]
    # float 0.5 little-endian inside the scalar record
    assert struct.pack("<f", 0.5) in records[1]
    assert b"img" in records[2] and b"PNG" in records[2]


def test_make_grid_and_save(tmp_path):
    imgs = np.random.RandomState(0).rand(5, 8, 8, 3).astype(np.float32) * 2 - 1
    grid = make_grid(imgs)
    assert grid.shape == (2 * 8, 3 * 8, 3) and grid.dtype == np.uint8
    out = tmp_path / "g" / "grid.png"
    save_image_grid(imgs, out)
    assert out.exists()


def test_module_summary():
    variables = {"params": {"mapping": {"fc0": {"weight": np.zeros((4, 8))}},
                            "synthesis": {"L0": {"bias": np.zeros((16,))}}}}
    text = module_summary(variables)
    assert "mapping/fc0" in text and "synthesis/L0" in text
    assert "TOTAL" in text and "48" in text
