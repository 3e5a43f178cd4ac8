"""Statistical parity against the REFERENCE C++ renderer itself.

Builds validation/reference_harness.cxx against the reference's own
header-only core (patched in a temp dir only for two MSVC-isms GCC
rejects: `void* = 0` template defaults and a non-dependent
static_assert), renders the reference CPU scene at high spp, and
compares converged means with this framework under REFERENCE_CPU
semantics. The two use different RNGs (mt19937 vs threefry), so this is
the honest cross-implementation check the oracle tests can't provide:
agreement of the *rendering equation*, not the sample sequence.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
HARNESS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "validation", "reference_harness.cxx")

W, H, DEPTH = 48, 27, 16


def _build_harness(tmp_path):
    if shutil.which("g++") is None or not os.path.isdir(REF_SRC):
        pytest.skip("no g++ or reference checkout")
    srcdir = os.path.join(tmp_path, "refsrc")
    os.makedirs(srcdir)
    for name in os.listdir(REF_SRC):
        if name.endswith(".hxx"):
            with open(os.path.join(REF_SRC, name)) as f:
                code = f.read()
            # GCC rejects two MSVC-isms; minimal build-time patches:
            code = code.replace("* = 0>", "* = nullptr>")
            code = code.replace("static_assert(std::false_type{}",
                                "static_assert(sizeof(type) == 0")
            with open(os.path.join(srcdir, name), "w") as f:
                f.write(code)
    exe = os.path.join(tmp_path, "ref_harness")
    subprocess.run(
        ["g++", "-O2", "-std=c++20", "-w", "-include", "cfloat",
         f"-I{srcdir}", HARNESS, "-o", exe, "-ltbb"],
        check=True, capture_output=True, timeout=300)
    return exe


@pytest.mark.slow
def test_image_matches_reference_cpp():
    import tempfile

    import jax

    from raytracinginoneweekend_tpu.config import REFERENCE_CPU, RenderConfig
    from raytracinginoneweekend_tpu.models.camera import make_camera
    from raytracinginoneweekend_tpu.models.scene import simple_scene_cpu
    from raytracinginoneweekend_tpu.render import render

    with tempfile.TemporaryDirectory() as tmp:
        exe = _build_harness(tmp)
        out = os.path.join(tmp, "ref.bin")
        # Two independent seeds of the reference, to calibrate MC noise.
        ref = []
        for seed in (123, 456):
            subprocess.run(
                [exe, str(W), str(H), "1024", str(DEPTH), str(seed), "0",
                 out], check=True, timeout=600)
            ref.append(np.fromfile(out, np.float32).reshape(H, W, 3))

        # aperture=0: the reference CPU camera's quirky defocus (Q2)
        # degenerates to no offset, removing lens-sampling variance.
        pos, lookat = (-4.0, 3.2, 5.0), (0.0, 1.0, 0.0)
        focus = float(np.linalg.norm(np.subtract(pos, lookat)))
        cam = make_camera(pos, lookat, (0, 1, 0), W / H, 42.0, 0.0, focus)
        cfg = RenderConfig(width=W, height=H, spp=256, max_depth=DEPTH,
                           camera_mode="cpu", options=REFERENCE_CPU)
        ours = np.asarray(render(simple_scene_cpu(), cam, cfg,
                                 jax.random.key(0)))

    # Noise calibration: two reference runs differ only by MC noise.
    self_noise = np.abs(ref[0] - ref[1]).mean()
    diff = np.abs(ours - ref[0]).mean()
    # ours is 256 spp vs reference 1024: expect ~sqrt((1+1/4)/(1+1))
    # larger plus any systematic error; 4x self-noise is a tight bound
    # that still fails on any real semantic divergence (biased sky,
    # wrong Fresnel, flipped camera, etc.).
    assert diff < max(4.0 * self_noise, 0.01), (diff, self_noise)
    # And the images must be structurally aligned (no flip/shift):
    # correlation of per-pixel luminance.
    la = ours.mean(-1).ravel() - ours.mean()
    lb = ref[0].mean(-1).ravel() - ref[0].mean()
    corr = float((la @ lb) / np.sqrt((la @ la) * (lb @ lb)))
    assert corr > 0.995, corr


def _write_scene_bin(path, scene):
    import struct

    c = np.asarray(scene.centers, np.float32)
    r = np.asarray(scene.radii, np.float32)
    mi = np.asarray(scene.material_index, np.int32)
    mt = np.asarray(scene.mtype, np.int32)
    alb = np.asarray(scene.albedo, np.float32)
    fz = np.asarray(scene.fuzz, np.float32)
    io_ = np.asarray(scene.ior, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", c.shape[0], mt.shape[0]))
        for i in range(c.shape[0]):
            f.write(struct.pack("<ffffi", c[i, 0], c[i, 1], c[i, 2],
                                r[i], int(mi[i])))
        for i in range(mt.shape[0]):
            f.write(struct.pack("<ifffff", int(mt[i]), alb[i, 0], alb[i, 1],
                                alb[i, 2], fz[i], io_[i]))


@pytest.mark.slow
def test_huge_scene_matches_reference_cpp():
    """The BASELINE huge scene rendered by the reference's own math vs this
    framework -- the scene arrays are exported to the harness so both sides
    see the identical geometry/materials (the reference's generator itself
    is dead code with the Q8 dangling-material bug)."""
    import tempfile

    import jax

    from raytracinginoneweekend_tpu.config import REFERENCE_CPU, RenderConfig
    from raytracinginoneweekend_tpu.models.camera import make_camera
    from raytracinginoneweekend_tpu.models.scene import huge_scene
    from raytracinginoneweekend_tpu.render import render

    scene = huge_scene(0)
    with tempfile.TemporaryDirectory() as tmp:
        exe = _build_harness(tmp)
        scene_bin = os.path.join(tmp, "scene.bin")
        _write_scene_bin(scene_bin, scene)
        out = os.path.join(tmp, "ref.bin")
        ref = []
        for seed in (123, 456):
            subprocess.run(
                [exe, str(W), str(H), "512", str(DEPTH), str(seed), "0",
                 out, scene_bin], check=True, timeout=600)
            ref.append(np.fromfile(out, np.float32).reshape(H, W, 3))

        pos, lookat = (-4.0, 3.2, 5.0), (0.0, 1.0, 0.0)
        focus = float(np.linalg.norm(np.subtract(pos, lookat)))
        cam = make_camera(pos, lookat, (0, 1, 0), W / H, 42.0, 0.0, focus)
        cfg = RenderConfig(width=W, height=H, spp=128, max_depth=DEPTH,
                           camera_mode="cpu", options=REFERENCE_CPU)
        ours = np.asarray(render(scene, cam, cfg, jax.random.key(0)))

    self_noise = np.abs(ref[0] - ref[1]).mean()
    diff = np.abs(ours - ref[0]).mean()
    assert diff < max(4.0 * self_noise, 0.015), (diff, self_noise)
    la = ours.mean(-1).ravel() - ours.mean()
    lb = ref[0].mean(-1).ravel() - ref[0].mean()
    corr = float((la @ lb) / np.sqrt((la @ la) * (lb @ lb)))
    assert corr > 0.99, corr
