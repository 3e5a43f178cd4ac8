"""CLI smoke tests (tiny configs; CPU)."""

import json
import os

from raytracinginoneweekend_tpu.cli import main
from raytracinginoneweekend_tpu.io.image import read_ppm


def test_cli_render_ppm(tmp_path, capsys):
    out = os.path.join(tmp_path, "img.ppm")
    rc = main(["render", "--scene", "simple-cuda", "--width", "32",
               "--height", "18", "--spp", "2", "--depth", "4",
               "--engine", "wavefront", "--out", out])
    assert rc == 0
    img = read_ppm(out)
    assert img.shape == (18, 32, 3)
    assert img.max() > 0


def test_cli_render_stats(tmp_path, capsys):
    """--stats prints the wavefront occupancy counters as JSON on stderr."""
    out = os.path.join(tmp_path, "img.ppm")
    rc = main(["render", "--scene", "simple-cuda", "--width", "32",
               "--height", "18", "--spp", "2", "--depth", "4",
               "--engine", "wavefront", "--stats", "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert stats["iters"] > 0 and stats["lanes"] > 0
    assert 0.0 < stats["occupancy"] <= 1.0
    # every camera ray traces at least one segment
    assert stats["segments_per_camera_ray"] >= 1.0


def test_cli_render_png_tiled(tmp_path):
    out = os.path.join(tmp_path, "img.png")
    rc = main(["render", "--scene", "huge", "--width", "24", "--height",
               "16", "--spp", "1", "--depth", "3", "--engine", "tiled",
               "--out", out])
    assert rc == 0
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_cli_bench_json(capsys):
    rc = main(["bench", "--scene", "simple-cuda", "--width", "16",
               "--height", "8", "--spp", "2", "--depth", "3",
               "--iters", "1"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "rays/s"
    assert rec["value"] > 0


def test_cli_fit_with_checkpoint(tmp_path, capsys):
    ckpt = os.path.join(tmp_path, "ckpt.npz")
    rc = main(["fit", "--scene", "simple-cuda", "--width", "16",
               "--height", "8", "--spp", "2", "--depth", "3",
               "--params", "albedo", "--steps", "4", "--fit-spp", "2",
               "--batch-pixels", "64", "--checkpoint", ckpt,
               "--checkpoint-every", "2"])
    assert rc == 0
    assert os.path.exists(ckpt)
    rc = main(["fit", "--scene", "simple-cuda", "--width", "16",
               "--height", "8", "--spp", "2", "--depth", "3",
               "--params", "albedo", "--steps", "2", "--fit-spp", "2",
               "--batch-pixels", "64", "--resume", ckpt])
    assert rc == 0
    assert "resumed" in capsys.readouterr().out


def test_cli_render_wavefront_sharded(tmp_path):
    out = os.path.join(tmp_path, "s.ppm")
    rc = main(["render", "--scene", "simple-cuda", "--width", "16",
               "--height", "8", "--spp", "2", "--depth", "3",
               "--engine", "wavefront-sharded", "--pool-size", "128",
               "--out", out])
    assert rc == 0
    assert read_ppm(out).shape == (8, 16, 3)
