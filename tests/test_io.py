"""utils/io.py: async write-behind encoder + decode-ahead iterator.

These carry the folder drivers' wall clock (one 1080p PNG encode costs
~10x the six-strategy device program), so correctness here = every frame
written, failures reported, decode order/skips preserved."""

import numpy as np

from underwater_image_enhancement_tpu.utils import io as uio


def test_async_writer_roundtrip(tmp_path, rng):
    imgs = [rng.random((16, 20, 3)).astype(np.float32) for _ in range(10)]
    with uio.AsyncWriter(workers=3, max_inflight=4) as w:
        for i, im in enumerate(imgs):
            w.write(str(tmp_path / f"im{i}.png"), im)
    assert w.close() == []
    for i, im in enumerate(imgs):
        back = uio.imread_unit(str(tmp_path / f"im{i}.png"))
        u8 = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal((back * 255).round().astype(np.uint8), u8)


def test_async_writer_reports_failures(tmp_path, rng):
    im = rng.random((8, 8, 3)).astype(np.float32)
    w = uio.AsyncWriter()
    # parent "directory" is a FILE -> mkdir inside imwrite_unit raises
    (tmp_path / "blocked").write_text("x")
    w.write(str(tmp_path / "blocked" / "sub" / "a.png"), im)
    w.write(str(tmp_path / "ok.png"), im)
    errors = w.close()
    assert len(errors) == 1 and "blocked" in errors[0][0]
    assert uio.imread_unit(str(tmp_path / "ok.png")) is not None


def test_decode_iter_order_and_skips(tmp_path, rng):
    import cv2

    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.png"
        cv2.imwrite(str(p), (rng.random((12 + i, 15, 3)) * 255).astype(np.uint8))
        paths.append(p)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    tiny = tmp_path / "tiny.png"
    cv2.imwrite(str(tiny), np.zeros((4, 4, 3), np.uint8))

    files = [paths[0], bad, paths[1], tiny, paths[2], paths[3], paths[4]]
    logs = []
    got = list(uio.decode_iter(files, log=logs.append, min_size=10))
    assert [p for p, _ in got] == paths
    assert got[3][1].shape == (15, 15, 3)
    assert any("unreadable" in m for m in logs)
    assert any("too small" in m for m in logs)
