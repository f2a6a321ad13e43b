"""CLI end-to-end tests on synthetic folders (in-process main())."""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.cli import main
from underwater_image_enhancement_tpu.utils import io as uio


@pytest.fixture()
def img_folder(tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "in"
    for i in range(2):
        img = np.clip(rng.random((40, 48, 3)) * 0.7 + 0.1, 0, 1).astype(np.float32)
        uio.imwrite_unit(str(src / f"p{i}.png"), img)
    return src


def test_cli_enhance_fixed_params(img_folder, tmp_path, capsys):
    out = tmp_path / "out"
    main(["enhance", "--input", str(img_folder), "--output", str(out)])
    assert sorted(p.name for p in out.iterdir()) == [
        "p0_enhanced.png", "p1_enhanced.png"]


def test_cli_six(img_folder, tmp_path, capsys):
    out = tmp_path / "six"
    main(["six", "--input", str(img_folder), "--output", str(out)])
    files = sorted(p.name for p in out.iterdir())
    assert "processing_log.csv" in files
    assert len([f for f in files if f.endswith(".png")]) == 12  # 2 imgs x 6
    log = (out / "processing_log.csv").read_text()
    assert "image_type" in log and "strategy" in log


def test_cli_auto(img_folder, tmp_path, capsys):
    out = tmp_path / "auto"
    main(["auto", "--input", str(img_folder), "--output", str(out)])
    assert len(list(out.iterdir())) == 2


def test_cli_assess(img_folder, capsys):
    main(["assess", "--input", str(img_folder)])
    text = capsys.readouterr().out
    assert "uiqm" in text and "p0.png" in text


def test_cli_build_dataset_and_selector(img_folder, tmp_path, capsys):
    out = tmp_path / "sys"
    # add a few more images so the classifier has data
    rng = np.random.default_rng(9)
    for i in range(4):
        img = np.clip(rng.random((40, 48, 3)) * (0.2 + 0.2 * i), 0, 1)
        uio.imwrite_unit(str(img_folder / f"x{i}.png"), img.astype(np.float32))
    main(["build-dataset", "--input", str(img_folder), "--output", str(out)])
    assert (out / "reports" / "dataset_building.csv").exists()
    main(["train-selector", "--output", str(out)])
    assert (out / "trained_models" / "trained_model.pkl").exists()
    text = capsys.readouterr().out
    assert "labeled 6 images" in text


def test_cli_six_all_unreadable_writes_empty_log(tmp_path, capsys):
    """Zero successes: no crash, a valid header-only CSV, a clear message
    (the reference exits cleanly with an empty log, six_stadigy.py:515-520)."""
    src = tmp_path / "bad"
    src.mkdir()
    (src / "junk.png").write_bytes(b"not an image")
    out = tmp_path / "o"
    main(["six", "--input", str(src), "--output", str(out)])
    text = capsys.readouterr().out
    assert "no images processed" in text
    log = (out / "processing_log.csv").read_text().strip().splitlines()
    assert log[0].startswith("filename,") and len(log) == 1


def test_cli_run_full_flow(img_folder, tmp_path, capsys):
    """One-command Phase 1 + Phase 2 (main.py:436-456)."""
    rng = np.random.default_rng(11)
    for i in range(4):
        img = np.clip(rng.random((40, 48, 3)) * (0.2 + 0.2 * i), 0, 1)
        uio.imwrite_unit(str(img_folder / f"y{i}.png"), img.astype(np.float32))
    out = tmp_path / "sys"
    main(["run", "--input", str(img_folder), "--output", str(out)])
    assert (out / "reports" / "dataset_building.csv").exists()
    assert (out / "trained_models" / "trained_model.pkl").exists()
    text = capsys.readouterr().out
    assert "labeled 6 images" in text


def test_cli_convert_vgg(tmp_path, capsys):
    """torch checkpoint -> npz -> perceptual/backbone loaders round-trip."""
    import torch

    from underwater_image_enhancement_tpu.models.vgg import (
        TORCH_CONV_IDX,
        load_perceptual_npz,
    )

    gen = np.random.default_rng(0)
    plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512]
    state = {}
    in_ch = 3
    for ti, out_ch in zip(TORCH_CONV_IDX, plan):
        state[f"features.{ti}.weight"] = torch.tensor(
            gen.normal(0, 0.05, (out_ch, in_ch, 3, 3)).astype(np.float32))
        state[f"features.{ti}.bias"] = torch.tensor(
            gen.normal(0, 0.05, (out_ch,)).astype(np.float32))
        in_ch = out_ch
    ckpt = tmp_path / "vgg16.pth"
    torch.save(state, str(ckpt))
    npz = tmp_path / "vgg16.npz"
    main(["convert-vgg", "--torch-ckpt", str(ckpt), "--out", str(npz)])
    assert "exported 10 conv layers" in capsys.readouterr().out

    vars7 = load_perceptual_npz(str(npz))
    w = np.asarray(vars7["params"]["conv0"]["kernel"])
    np.testing.assert_allclose(
        w, state["features.0.weight"].numpy().transpose(2, 3, 1, 0), atol=0)
    # trainer wiring: pretrained_vgg fills the backbone trunk AND replaces
    # the random perceptual trunk (no warning)
    import warnings

    from underwater_image_enhancement_tpu.train.trainer import VGGTrainer

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        t = VGGTrainer(hidden_dim=16, image_size=32, epochs=4,
                       pretrained_vgg=str(npz))
    np.testing.assert_array_equal(
        np.asarray(t.params["vgg"]["conv0"]["kernel"]), w)
    np.testing.assert_array_equal(
        np.asarray(t.vgg_loss_params["params"]["conv0"]["kernel"]), w)


def test_apply_strategy_accepts_list_params(img_unit):
    """JSON/CLI configs produce lists; _freeze must hash them (tile_grid_size
    is a sequence in the reference config, config.py:60)."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.strategies import apply_strategy

    out = apply_strategy(jnp.asarray(img_unit), "clahe_enhancement",
                         {"tile_grid_size": [8, 8], "clip_limit": 2.5})
    ref = apply_strategy(jnp.asarray(img_unit), "clahe_enhancement",
                         {"tile_grid_size": (8, 8), "clip_limit": 2.5})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cli_six_mixed_sizes_and_batching(tmp_path, rng):
    """Same-shape groups batch together; mixed shapes still all process."""
    src = tmp_path / "mixed"
    for i in range(3):
        uio.imwrite_unit(str(src / f"a{i}.png"),
                         rng.random((32, 40, 3)).astype(np.float32))
    uio.imwrite_unit(str(src / "b0.png"),
                     rng.random((48, 40, 3)).astype(np.float32))
    out = tmp_path / "o"
    main(["six", "--input", str(src), "--output", str(out), "--fast",
          "--batch-size", "2"])
    pngs = [f for f in out.iterdir() if f.suffix == ".png"]
    assert len(pngs) == 4 * 6


def test_cli_six_streams_decodes(tmp_path, rng, monkeypatch):
    """Decode buffering is bounded: a full same-shape batch flushes (its
    writes are SUBMITTED) long before the whole folder is decoded —
    streaming like build_dataset, not decode-everything-first.  The
    decode-ahead thread may run up to its queue bound (8) past the batch,
    so the gate is a bound, not an exact index."""
    src = tmp_path / "stream"
    n = 24
    for i in range(n):
        uio.imwrite_unit(str(src / f"s{i:02d}.png"),
                         rng.random((32, 40, 3)).astype(np.float32))
    events = []
    real_read = uio.imread_unit
    real_write = uio.AsyncWriter.write
    monkeypatch.setattr(uio, "imread_unit",
                        lambda p: (events.append("r"), real_read(p))[1])
    # AsyncWriter.write is called on the MAIN thread inside process_chunk,
    # so its position among the "r" events is meaningful (the actual
    # encode runs on the pool; patching imwrite_unit would be racy)
    monkeypatch.setattr(
        uio.AsyncWriter, "write",
        lambda self, p, im: (events.append("w"), real_write(self, p, im))[1])
    main(["six", "--input", str(src), "--output", str(tmp_path / "o"),
          "--fast", "--batch-size", "2"])
    # first write submit must come after the 2-image batch but before the
    # folder is fully decoded: <= batch(2) + decode-ahead queue(8) + 2 slack
    first_w = events.index("w")
    assert 2 <= first_w <= 12, events
    assert events.count("r") == n and events.count("w") == 6 * n


def test_cli_fusion(img_folder, tmp_path):
    out = tmp_path / "fusion"
    main(["fusion", "--input", str(img_folder), "--output", str(out)])
    files = sorted(p.name for p in out.iterdir())
    assert files == ["p0_fusion.png", "p1_fusion.png"]


def test_cli_waternet(img_folder, tmp_path):
    out = tmp_path / "waternet"
    main(["waternet", "--input", str(img_folder), "--output", str(out),
          "--batch-size", "2"])
    files = sorted(p.name for p in out.iterdir())
    assert files == ["p0_waternet.png", "p1_waternet.png"]


def test_cli_train_zoo_then_enhance(tmp_path, rng):
    """train-zoo (resnet) -> checkpoint -> enhance --arch resnet consumes it
    (the train-vgg-flow mirror for the model_architectures.py backbones,
    VERDICT r3 #6)."""
    raw = tmp_path / "raw"
    ref = tmp_path / "ref"
    for i in range(4):
        clean = np.clip(rng.random((32, 32, 3)) * 0.9 + 0.05,
                        0, 1).astype(np.float32)
        uio.imwrite_unit(str(ref / f"i{i}.png"), clean)
        uio.imwrite_unit(str(raw / f"i{i}.png"),
                         (clean ** 1.3).astype(np.float32))
    out = tmp_path / "zoo_out"
    main(["train-zoo", "--input", str(raw), "--reference", str(ref),
          "--output", str(out), "--model", "resnet", "--image-size", "32",
          "--epochs", "2", "--batch-size", "2", "--pretrained", "none"])
    assert (out / "final_model").exists()
    assert (out / "training_history.json").exists()

    enh = tmp_path / "enh"
    main(["enhance", "--input", str(raw), "--output", str(enh),
          "--model", str(out / "final_model"), "--arch", "resnet",
          "--input-size", "32"])
    names = sorted(p.name for p in enh.iterdir())
    assert names == [f"i{i}_enhanced.png" for i in range(4)]


def test_cli_fusion_mixed_sizes_streams(tmp_path, rng, monkeypatch):
    """`fusion` batches same-shape groups, handles mixed shapes, skips
    unreadable files, and streams: a full same-shape batch's writes are
    submitted before the folder is fully decoded (the decode-everything-
    first version held the whole folder in RAM)."""
    src = tmp_path / "mixed"
    n_a = 12
    for i in range(n_a):
        uio.imwrite_unit(str(src / f"a{i:02d}.png"),
                         rng.random((32, 40, 3)).astype(np.float32))
    uio.imwrite_unit(str(src / "b0.png"),
                     rng.random((48, 40, 3)).astype(np.float32))
    (src / "broken.png").write_bytes(b"not a png")
    events = []
    real_read = uio.imread_unit
    real_write = uio.AsyncWriter.write
    monkeypatch.setattr(uio, "imread_unit",
                        lambda p: (events.append("r"), real_read(p))[1])
    monkeypatch.setattr(
        uio.AsyncWriter, "write",
        lambda self, p, im: (events.append("w"), real_write(self, p, im))[1])
    out = tmp_path / "o"
    main(["fusion", "--input", str(src), "--output", str(out),
          "--batch-size", "2"])
    pngs = [f for f in out.iterdir() if f.suffix == ".png"]
    assert len(pngs) == n_a + 1
    # first write submit after the first full 2-image batch but well before
    # the folder is decoded: <= batch(2) + decode-ahead queue(8) + 2 slack
    first_w = events.index("w")
    assert 2 <= first_w <= 12, events


def test_cli_waternet_mixed_sizes_streams(tmp_path, rng, monkeypatch):
    """Same streaming gates for `waternet` (VERDICT r3 #5)."""
    src = tmp_path / "mixed"
    n_a = 12
    for i in range(n_a):
        uio.imwrite_unit(str(src / f"a{i:02d}.png"),
                         rng.random((32, 40, 3)).astype(np.float32))
    uio.imwrite_unit(str(src / "b0.png"),
                     rng.random((48, 40, 3)).astype(np.float32))
    (src / "broken.png").write_bytes(b"not a png")
    events = []
    real_read = uio.imread_unit
    real_write = uio.AsyncWriter.write
    monkeypatch.setattr(uio, "imread_unit",
                        lambda p: (events.append("r"), real_read(p))[1])
    monkeypatch.setattr(
        uio.AsyncWriter, "write",
        lambda self, p, im: (events.append("w"), real_write(self, p, im))[1])
    out = tmp_path / "o"
    main(["waternet", "--input", str(src), "--output", str(out),
          "--batch-size", "2"])
    pngs = [f for f in out.iterdir() if f.suffix == ".png"]
    assert len(pngs) == n_a + 1
    first_w = events.index("w")
    assert 2 <= first_w <= 12, events
