"""Edge-sampled silhouette (visibility boundary) gradients.

The BASELINE pixel-gradient metric asks AD to match finite differences for
GEOMETRY parameters (centers, radii), whose loss dependence is dominated by
the silhouette discontinuity of raytracer.hxx:52-92's hit/miss flip --
interior AD alone measures exactly zero on the black-sphere-vs-sky configs
used here, so every signal these tests assert comes from ops/silhouette.py.

FD caveat encoded in the test design: finite differences of a Monte-Carlo
render are themselves noisy estimators (flip-count quantization ~1/sqrt(
samples in the swept band)), so the configs pin the sphere's radiance to
exactly black (every probe and every flipped sample is deterministic) and
use a constant-diff target so the MSE cotangent is exact. Tolerances are
set by measured FD convergence, not wishful thinking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig
from raytracinginoneweekend_tpu.models.camera import camera_ray, make_camera
from raytracinginoneweekend_tpu.models.scene import LAMBERT, METAL, Scene
from raytracinginoneweekend_tpu.ops.silhouette import (
    lobe_direction_density, project_to_screen, silhouette_points)
from raytracinginoneweekend_tpu.optim import fit, render_loss
from raytracinginoneweekend_tpu.render import render

W, H = 96, 72


def black_sphere_scene(cx=0.0, cz=-1.5, r=0.5) -> Scene:
    """One perfectly black lambert sphere against the sky: the only
    dependence of the image on (centers, radii) is the silhouette."""
    return Scene(
        centers=jnp.array([[cx, 0.0, cz]], jnp.float32),
        radii=jnp.array([r], jnp.float32),
        material_index=jnp.array([0], jnp.int32),
        mtype=jnp.array([LAMBERT], jnp.int32),
        albedo=jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0], jnp.float32),
        ior=jnp.array([1.0], jnp.float32),
    )


def pinhole_cam(w=W, h=H):
    return make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), w / h, 60.0, 0.0,
                       1.0)


def test_projection_roundtrip():
    """project_to_screen inverts the camera's film mapping exactly, in both
    the corrected and the quirk-Q11 ("cuda") direction conventions."""
    cams = [(pinhole_cam(), "pinhole"),
            (make_camera((-4, 3.2, 5), (0, 1, 0), (0, 1, 0), W / H, 42.0,
                         0.0, 6.0), "pinhole"),
            (pinhole_cam(), "cuda")]
    for cam, mode in cams:
        for uv in [(0.1, 0.2), (0.7, 0.9), (0.5, 0.5), (0.0, 0.99)]:
            o, d = camera_ray(cam, jnp.float32(uv[0]), jnp.float32(uv[1]),
                              jax.random.key(0), mode)
            uv2, ok = project_to_screen(cam, o + 2.7 * d, mode)
            assert bool(ok)
            np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-5)


def test_silhouette_points_are_tangent():
    """Silhouette points satisfy the tangency condition (p-c).(p-eye) = 0
    and lie on the sphere -- the defining equations of the visibility edge
    (the disc == 0 locus of raytracer.hxx:52-92)."""
    c = jnp.array([[0.3, -0.2, -2.0], [-1.0, 0.5, -3.0]], jnp.float32)
    r = jnp.array([0.5, -0.7], jnp.float32)  # negative radius: same edge
    eye = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    phis = jnp.broadcast_to(jnp.linspace(0, 2 * np.pi, 16,
                                         endpoint=False), (2, 16))
    p, valid = silhouette_points(c, r, eye, phis)
    assert bool(valid.all())
    on_sphere = np.linalg.norm(np.asarray(p) - np.asarray(c)[:, None],
                               axis=-1) - np.abs(np.asarray(r))[:, None]
    np.testing.assert_allclose(on_sphere, 0.0, atol=1e-5)
    tangency = np.sum(np.asarray(p - c[:, None]) * np.asarray(p - eye),
                      axis=-1)
    np.testing.assert_allclose(tangency, 0.0, atol=1e-5)


def test_interior_ad_is_blind_to_the_silhouette():
    """Control: without the boundary term, the loss gradient w.r.t. the
    black sphere's center/radius is EXACTLY zero (the image is piecewise
    constant in them) -- the gap VERDICT r1 flagged."""
    scene = black_sphere_scene()
    cam = pinhole_cam()
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)

    def loss_of(params):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=W, height=H, spp=2,
                           max_depth=2, camera_mode="pinhole",
                           options=DEFAULT, boundary_samples=0)

    g = jax.grad(loss_of)({"centers": scene.centers, "radii": scene.radii})
    np.testing.assert_array_equal(np.asarray(g["centers"]), 0.0)
    np.testing.assert_array_equal(np.asarray(g["radii"]), 0.0)


@pytest.mark.slow
def test_boundary_grad_matches_finite_differences():
    """The FD-parity metric for geometry leaves (BASELINE.md:32): loss
    gradients w.r.t. center components and the radius match central finite
    differences at rtol <= 5e-2 on a config where only the silhouette
    moves.

    Construction: target = render(same config, same key) - 0.5, so
    diff == 0.5 exactly and the MSE cotangent is constant -- FD's
    second-order error (pixel-coverage curvature) is the only gap left,
    measured < 4% at these (eps, spp)."""
    scene = black_sphere_scene()
    cam = pinhole_cam()
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=W, height=H,
                                  spp=spp, wave_spp=spp, max_depth=2,
                                  camera_mode="pinhole", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, boundary):
        return render_loss(params, scene, cam, target, ids, key, width=W,
                           height=H, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           boundary_samples=boundary)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 2048))(params)

    eps = 0.015
    # rtol per component = the measured precision OF THE FD ESTIMATE at
    # these (eps, spp): c_z and r have gradient magnitudes ~0.29/0.86 where
    # FD repeats to ~2%; c_y's magnitude is ~0.02 and independent FD runs
    # (keys x spp in {8..512}) scatter over 0.0195..0.0229 (+-8%) around
    # the converged estimator value 0.0210, so 5e-2 would test FD noise,
    # not the estimator.
    for leaf, idx, rtol in [("centers", (0, 1), 0.12),
                            ("centers", (0, 2), 5e-2),
                            ("radii", (0,), 5e-2)]:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0) - loss_of(dn, 0)) / (2 * eps))
        ad = float(g[leaf][idx])
        assert fd != 0.0
        assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)


@pytest.mark.slow
def test_glass_rim_deep_probe_matches_finite_differences():
    """DIELECTRIC silhouettes need the deep inside probe (round 4): just
    inside a glass rim sits a grazing band whose radiance confuses a
    0.3-px probe. Reproducer: a glass sphere on a black field (huge
    black wall behind; only rim-deflected rays escape to the bright
    sky), camera zoomed onto the rim so the frame holds exactly
    {black field | rim | bright deflection annulus} and the lensed
    interior edges (branchprob sweep territory) stay OUT of frame.
    Measured (CPU, spp 64): FD truth d/dr = 0.124 +- 0.020;
    interior + boundary with the deep probe = 0.123 +- 0.020 SE --
    FD parity -- while the tight-probe ablation claims ~0.50 (4x).
    The once-suspected rr_grad sweep overlap on this band was resolved
    in round 5 by the CRN-paired ownership study (scripts/
    rim_ownership.py -> docs/RIM_OWNERSHIP_r05.json): the RR + sweep
    pair largely cancels here (+0.49 / -0.42) and the full ungated
    total still matches FD within 2 SE -- no double count."""
    from raytracinginoneweekend_tpu.models.scene import DIELECTRIC
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    w, h = 48, 36
    scene = Scene(
        centers=jnp.array([[0.0, 0.0, -3.0], [0.0, 0.0, -60.0]],
                          jnp.float32),
        radii=jnp.array([1.0, 50.0], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([DIELECTRIC, LAMBERT], jnp.int32),
        albedo=jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.zeros(2, jnp.float32),
        ior=jnp.array([1.5, 1.0], jnp.float32))
    cam = make_camera((0, 0, 0), (1.0, 0.0, -2.83), (0, 1, 0), w / h,
                      10.0, 0.0, 1.0)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base = render_pixels_impl(scene, cam, ids, jax.random.key(3),
                              width=w, height=h, spp=spp, wave_spp=spp,
                              max_depth=6, camera_mode="pinhole",
                              options=DEFAULT)
    target = base - 0.5
    kw = dict(width=w, height=h, spp=spp, max_depth=6,
              camera_mode="pinhole", options=DEFAULT)

    def loss_at(dr, rkey):
        s = scene._replace(radii=scene.radii.at[0].add(dr))
        img = render_pixels_impl(s, cam, ids, rkey, width=w, height=h,
                                 spp=spp, wave_spp=spp, max_depth=6,
                                 camera_mode="pinhole", options=DEFAULT)
        return float(jnp.mean((img - target) ** 2))

    eps = 0.01
    fds = np.array([(loss_at(eps, jax.random.key(50 + k))
                     - loss_at(-eps, jax.random.key(50 + k))) / (2 * eps)
                    for k in range(4)])
    truth = fds.mean()
    assert truth > 0.06, fds  # the rim term is the signal here

    def ad(skey):
        g = jax.grad(render_loss)({"radii": scene.radii}, scene, cam,
                                  target, ids, skey,
                                  boundary_samples=1024,
                                  engine="planar", **kw)
        return float(g["radii"][0])

    vals = np.array([ad(jax.random.key(100 + k)) for k in range(4)])
    np.testing.assert_allclose(vals.mean(), truth, rtol=0.35,
                               err_msg=str((vals, fds)))

    # Tight-probe ablation (probe_diel_frac=0): the band blinds/confuses
    # it -- measured ~4x off on this config.
    from raytracinginoneweekend_tpu.ops.silhouette import (
        boundary_surrogate)

    cot = 2.0 * jax.lax.stop_gradient(base - target) / base.size

    def bnd(frac, skey):
        def f(radii):
            return boundary_surrogate(
                scene._replace(radii=radii), cam, "pinhole", cot, w, h,
                skey, 6, DEFAULT, n_angles=1024, probe_diel_frac=frac)

        return float(jax.grad(f)(scene.radii)[0])

    tight = np.mean([bnd(0.0, jax.random.key(100 + k)) for k in range(3)])
    deep = np.mean([bnd(0.15, jax.random.key(100 + k)) for k in range(3)])
    assert abs(tight - truth) > 2.0 * abs(deep - truth), (tight, deep,
                                                          truth)


@pytest.mark.slow
def test_boundary_grad_cpu_mode_aperture_integration():
    """Quirk Q2 (camera.hxx:51-56, the dead CPU path's screen-scaled
    unit-ball lens) loses its central-viewpoint approximation (round 5,
    VERDICT r4 #7): the boundary term now solves the edge position as a
    two-iteration Picard fixed point through the quirky lens map and
    integrates over the ball. Measured on this defocus-dominated config
    (aperture 0.6, focus on the far sphere; full sweep in
    docs/CPU_LENS_r05.json): on the two blur-dominated components the
    lens-integrated estimator lands within ~0.5% of FD while the
    central-viewpoint ablation errs 4.5-8x more (centers_z err 0.0025
    vs 0.0211, radius err 0.0046 vs 0.0209)."""
    from raytracinginoneweekend_tpu.ops.silhouette import (
        boundary_surrogate)
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    w, h = 96, 72
    scene = Scene(
        centers=jnp.array([[0.0, 0.0, -1.0], [-0.55, 0.0, -2.4]],
                          jnp.float32),
        radii=jnp.array([0.35, 0.5], jnp.float32),
        material_index=jnp.array([0, 0], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0], jnp.float32),
        ior=jnp.array([1.0], jnp.float32))
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), w / h, 60.0, 0.6,
                      2.4)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base = render_pixels_impl(scene, cam, ids, jax.random.key(3), width=w,
                              height=h, spp=spp, wave_spp=spp, max_depth=2,
                              camera_mode="cpu", options=DEFAULT)
    target = base - 0.5
    cot = 2.0 * jax.lax.stop_gradient(base - target) / base.size

    @jax.jit
    def loss_fd(centers, radii, rkey):
        s = scene._replace(centers=centers, radii=radii)
        img = render_pixels_impl(s, cam, ids, rkey, width=w, height=h,
                                 spp=spp, wave_spp=spp, max_depth=2,
                                 camera_mode="cpu", options=DEFAULT)
        return jnp.mean((img - target) ** 2)

    def grad_fn(ablation):
        def f(params, skey):
            interior = render_loss(params, scene, cam, target, ids, skey,
                                   width=w, height=h, spp=spp,
                                   max_depth=2, camera_mode="cpu",
                                   options=DEFAULT, engine="planar")
            s = scene._replace(centers=params["centers"],
                               radii=params["radii"])
            sur = boundary_surrogate(s, cam, "cpu", cot, w, h, skey, 2,
                                     DEFAULT, n_angles=1024,
                                     _cpu_central_ablation=ablation)
            return interior + sur - jax.lax.stop_gradient(sur)
        return jax.jit(jax.grad(f))

    params = {"centers": scene.centers, "radii": scene.radii}
    g_new = [grad_fn(False)(params, jax.random.key(100 + k))
             for k in range(2)]
    g_ctr = [grad_fn(True)(params, jax.random.key(100 + k))
             for k in range(2)]

    eps = 0.015
    # The two components where the aperture dominates the edge motion.
    for leaf, idx in [("centers", (0, 2)), ("radii", (0,))]:
        fds = []
        for k in range(3):
            rk = jax.random.key(50 + k)
            up = dict(params)
            up[leaf] = params[leaf].at[idx].add(eps)
            dn = dict(params)
            dn[leaf] = params[leaf].at[idx].add(-eps)
            fds.append(float((loss_fd(up["centers"], up["radii"], rk)
                              - loss_fd(dn["centers"], dn["radii"], rk))
                             / (2 * eps)))
        fd = float(np.mean(fds))
        new = float(np.mean([float(g[leaf][idx]) for g in g_new]))
        ctr = float(np.mean([float(g[leaf][idx]) for g in g_ctr]))
        assert fd != 0.0
        assert np.isclose(new, fd, rtol=0.03), (leaf, idx, new, fd, fds)
        # Causality: the lens integration is what buys the parity.
        assert abs(ctr - fd) > 2.0 * abs(new - fd), (leaf, idx, new, ctr,
                                                     fd)


@pytest.mark.slow
def test_boundary_grad_thinlens_aperture_integration():
    """Geometry FD parity under a DEFOCUSED thin-lens camera (nonzero
    aperture): the boundary term integrates over the lens, so gradients
    stay FD-exact where the old central-viewpoint approximation fails.

    Config chosen to make aperture parallax matter: a close foreground
    sphere (strong blur at aperture 0.6, focus on the far sphere) plus a
    far sphere whose edge the aperture partially sees AROUND -- measured
    on this config, the central-viewpoint estimate errs 7-43% per
    component while the lens-integrated one lands 0.1-9% (FD noise on
    the occluded edge included), so the tolerances below discriminate."""
    w, h = 96, 72
    scene = Scene(
        centers=jnp.array([[0.0, 0.0, -1.0], [-0.55, 0.0, -2.4]],
                          jnp.float32),
        radii=jnp.array([0.35, 0.5], jnp.float32),
        material_index=jnp.array([0, 0], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0], jnp.float32),
        ior=jnp.array([1.0], jnp.float32),
    )
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), w / h, 60.0, 0.6,
                      2.4)
    key = jax.random.key(3)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=w, height=h,
                                  spp=spp, wave_spp=spp, max_depth=2,
                                  camera_mode="thinlens", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, boundary):
        return render_loss(params, scene, cam, target, ids, key, width=w,
                           height=h, spp=spp, max_depth=2,
                           camera_mode="thinlens", options=DEFAULT,
                           boundary_samples=boundary)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 4096))(params)

    eps = 0.02
    # rtol = ~2x the measured lens-integrated error per component (the
    # occluded far edge carries the most FD noise); every one is far
    # below the measured central-approximation error on the same
    # component (0.37, 0.13, 0.067->0.03 fails, 0.43, 0.15).
    for leaf, idx, rtol in [("centers", (0, 0), 0.12),
                            ("centers", (0, 2), 2e-2),
                            ("radii", (0,), 3e-2),
                            ("centers", (1, 0), 0.12),
                            ("radii", (1,), 0.14)]:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0) - loss_of(dn, 0)) / (2 * eps))
        ad = float(g[leaf][idx])
        assert fd != 0.0
        assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)


def shadow_scene(cx=0.0, occ_y=0.5, occ_z=-1.2, r=0.3) -> Scene:
    """Grey lambert ground + a BLACK occluder hovering above it, placed
    outside the camera frustum (shadow_cam): the occluder affects the
    image ONLY by blocking sky light from ground points -- a one-bounce
    visibility effect invisible to interior AD and to the primary
    boundary term alike."""
    return Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [cx, occ_y, occ_z]],
                          jnp.float32),
        radii=jnp.array([100.0, r], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0], jnp.float32),
    )


def shadow_cam(w, h):
    """Narrow FOV tilted down at the ground patch under the occluder."""
    return make_camera((0, 0.5, 0.3), (0, -0.5, -1.2), (0, 1, 0), w / h,
                       40.0, 0.0, 1.0)


def test_shadow_scene_occluder_invisible_to_camera():
    """Precondition of the secondary tests: the occluder's primary
    silhouette is outside the frustum (a glowing occluder over a black
    ground at depth 1 renders pure sky everywhere it doesn't cover)."""
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    w, h = 64, 48
    ids = jnp.arange(w * h, dtype=jnp.int32)
    for cx in (0.0, 0.45):
        s = shadow_scene(cx)._replace(
            albedo=jnp.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]],
                             jnp.float32))
        img = render_pixels_impl(s, shadow_cam(w, h), ids,
                                 jax.random.key(1), width=w, height=h,
                                 spp=4, wave_spp=4, max_depth=1,
                                 camera_mode="pinhole", options=DEFAULT)
        assert float(img.max()) <= 1.0 + 1e-6  # sky only, never 10


def test_secondary_interior_ad_is_blind_to_the_shadow():
    """Control: without the secondary term, the loss gradient w.r.t. the
    BLACK occluder's center/radius is EXACTLY zero -- secondary rays that
    hit it terminate with zero attenuation, so only the hit/miss flip
    (the boundary) carries signal, and interior AD cannot see it. The
    primary term adds nothing either: the occluder is out of frustum."""
    w, h = 64, 48
    scene = shadow_scene()
    cam = shadow_cam(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    def loss_of(params, boundary, secondary):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=w, height=h, spp=2,
                           max_depth=2, camera_mode="pinhole",
                           options=DEFAULT, boundary_samples=boundary,
                           secondary_samples=secondary,
                           secondary_spheres=1)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 0, 0))(params)
    np.testing.assert_array_equal(np.asarray(g["centers"][1]), 0.0)
    assert float(g["radii"][1]) == 0.0
    # The secondary term produces a nonzero, finite occluder gradient.
    g2 = jax.grad(lambda p: loss_of(p, 0, 16))(params)
    assert np.isfinite(np.asarray(g2["centers"])).all()
    assert np.isfinite(np.asarray(g2["radii"])).all()
    assert float(jnp.abs(g2["centers"][1]).max()) > 0.0


@pytest.mark.slow
def test_secondary_boundary_grad_matches_finite_differences():
    """FD parity for the ONE-BOUNCE (shadow) boundary term on the
    floating-occluder config (occluder at (0, 1.5, -1), camera level):
    interior AD is exactly zero there, so everything asserted comes from
    secondary_boundary_surrogate.

    Measured across seeds/eps/spp, FD scatters: c_y in 0.00266..0.00346,
    r in -0.0199..-0.0213, c_x (symmetric-zero) +-4.5e-4 noise floor,
    c_z in 0.0005..0.0016 around ~0.0009. The AD estimator lands at
    c_y 0.00326, r -0.0205, c_z 0.00084 with <0.2% key-to-key variance;
    tolerances below are ~2x the per-component FD repeatability."""
    scene = Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [0.0, 1.5, -1.0]],
                          jnp.float32),
        radii=jnp.array([100.0, 0.4], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0], jnp.float32),
    )
    cam = pinhole_cam()
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=W, height=H,
                                  spp=spp, wave_spp=spp, max_depth=2,
                                  camera_mode="pinhole", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, secondary):
        return render_loss(params, scene, cam, target, ids, key, width=W,
                           height=H, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           secondary_samples=secondary, secondary_spheres=1)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 64))(params)

    eps = 0.02
    checks = [("centers", (1, 1), 0.15, None),
              ("radii", (1,), 0.08, None),
              ("centers", (1, 0), None, 9e-4),  # symmetric ~0 + FD noise
              ("centers", (1, 2), None, 9e-4)]  # small signal vs FD noise
    for leaf, idx, rtol, atol in checks:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0) - loss_of(dn, 0)) / (2 * eps))
        ad = float(g[leaf][idx])
        if rtol is not None:
            assert fd != 0.0
            assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)
        else:
            assert abs(ad - fd) < atol, (leaf, idx, ad, fd)


@pytest.mark.slow
def test_secondary_fit_recovers_shadow_position():
    """fit(secondary_samples=...) recovers the occluder's lateral position
    from its SHADOW alone (the occluder never appears in the image; its
    depth/height stay ambiguous under hemispherical sky light, so only
    the well-constrained x coordinate is asserted tightly)."""
    w, h = 64, 48
    cam = shadow_cam(w, h)
    cfg = RenderConfig(width=w, height=h, spp=16, max_depth=2,
                       camera_mode="pinhole", options=DEFAULT)
    truth = shadow_scene(cx=0.3)
    target = render(truth, cam, cfg, jax.random.key(0))

    _, params, _, _ = fit(
        shadow_scene(cx=0.0), cam, target, cfg, which=("centers",),
        steps=80, learning_rate=2e-2, batch_pixels=w * h, spp=16,
        secondary_samples=48, secondary_spheres=1,
        base_key=jax.random.key(5))
    c = np.asarray(params["centers"])
    assert abs(c[1, 0] - 0.3) < 0.06, c[1]  # moved 0 -> ~0.3
    # Height/depth are ambiguous under hemispherical sky light (a shadow
    # under-constrains its caster along the vertex->caster ray): adam
    # wanders along that family (observed drift up to ~0.45 across RNG
    # streams). Only assert it does not diverge outright.
    assert abs(c[1, 1] - 0.5) < 0.6 and abs(c[1, 2] + 1.2) < 0.6, c[1]


def test_lobe_density_matches_empirical_draws():
    """lobe_direction_density is the true direction law of the reference's
    scatter draw dir' = axis + f*s (raytracer.hxx:134/147 "ball",
    cuda_impl.cu:206/220 "unit"): binned cos-theta marginals of 400k
    actual draws match the analytic 2*pi*p(w) per bin, for the lambert
    case (f = 1) and a metal-roughness case (f = 0.35) in both modes."""
    axis = jnp.array([0.3, -0.5, 0.8])
    axis = axis / jnp.linalg.norm(axis)
    n = 400_000
    helper = np.array([1.0, 0.0, 0.0])
    e1 = np.cross(np.asarray(axis), helper)
    e1 /= np.linalg.norm(e1)
    for mode in ("unit", "ball"):
        for f in (1.0, 0.35):
            k1, k2 = jax.random.split(
                jax.random.fold_in(jax.random.key(0),
                                   hash((mode, f)) % 2**31))
            g = jax.random.normal(k1, (n, 3))
            u = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
            s = u if mode == "unit" else (
                u * (jax.random.uniform(k2, (n,)) ** (1 / 3))[:, None])
            w = axis + f * s
            w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
            c_emp = np.asarray(jnp.sum(w * axis, axis=-1))

            lo = float(np.sqrt(1 - f * f)) if f < 1 else -1.0
            edges = np.linspace(lo, 1.0, 25)
            mids = 0.5 * (edges[:-1] + edges[1:])
            emp = np.histogram(c_emp, bins=edges)[0] / n / np.diff(edges)
            wv = (mids[:, None] * np.asarray(axis)
                  + np.sqrt(1 - mids**2)[:, None] * e1)
            ana = 2 * np.pi * np.asarray(lobe_direction_density(
                jnp.asarray(wv, jnp.float32), axis, jnp.float32(f), mode))
            # Skip the 2 bins at the support edge (midpoint rule vs the
            # integrable 1/sqrt divergence of the "unit" density there);
            # compare the rest relative to the PEAK (low bins are noisy).
            err = np.abs(emp[2:] - ana[2:]) / ana.max()
            assert err.max() < 0.03, (mode, f, err.max())


def mirror_scene(fuzz=0.4, cx=0.0, cy=0.49, cz=-2.69, r=0.3) -> Scene:
    """Grey FUZZY-METAL ground + a black occluder ABOVE the frustum placed
    on the mirror direction of the viewed ground patch: the occluder
    affects the image only through its rough REFLECTION -- a one-bounce
    visibility effect at a specular vertex, invisible to interior AD, to
    the primary boundary term, and to the lambert-only secondary term."""
    return Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [cx, cy, cz]], jnp.float32),
        radii=jnp.array([100.0, r], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([METAL, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.7, 0.7, 0.7], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([fuzz, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0], jnp.float32),
    )


def test_metal_reflection_interior_ad_is_blind():
    """Control for the fuzzy-metal vertex extension: the occluder is out
    of frustum (glow test) yet its reflection covers a big pixel
    footprint; interior AD measures EXACTLY zero on its center/radius,
    while the secondary term produces a nonzero finite gradient."""
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    w, h = 64, 48
    scene = mirror_scene()
    cam = shadow_cam(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)

    glow = scene._replace(albedo=jnp.array(
        [[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], jnp.float32))
    img = render_pixels_impl(glow, cam, ids, jax.random.key(1), width=w,
                             height=h, spp=4, wave_spp=4, max_depth=1,
                             camera_mode="pinhole", options=DEFAULT)
    assert float(img.max()) <= 1.0 + 1e-6  # occluder never seen directly

    target = jnp.zeros((w * h, 3), jnp.float32)

    def loss_of(params, secondary):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=w, height=h, spp=2,
                           max_depth=2, camera_mode="pinhole",
                           options=DEFAULT, secondary_samples=secondary,
                           secondary_spheres=1)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 0))(params)
    np.testing.assert_array_equal(np.asarray(g["centers"][1]), 0.0)
    assert float(g["radii"][1]) == 0.0
    g2 = jax.grad(lambda p: loss_of(p, 16))(params)
    assert np.isfinite(np.asarray(g2["centers"])).all()
    assert np.isfinite(np.asarray(g2["radii"])).all()
    assert float(jnp.abs(g2["radii"][1])) > 0.0


@pytest.mark.slow
def test_metal_boundary_grad_matches_finite_differences():
    """FD parity for the one-bounce boundary term at FUZZY-METAL vertices
    (rough-reflection edges) on the mirror-scene config.

    Measured across FD keys (3/5/7) at eps=0.02, spp=64: r in
    -0.1124..-0.1148, c_y in 0.00463..0.00493, c_z in -0.0080..-0.0100,
    c_x (symmetric-zero) +-4e-3 noise. The AD estimator lands at
    r -0.1118..-0.1132, c_y 0.0047..0.0049, c_z -0.0083..-0.0085 across
    its own keys; tolerances are ~2x the FD repeatability."""
    scene = mirror_scene()
    cam = shadow_cam(W, H)
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=W, height=H,
                                  spp=spp, wave_spp=spp, max_depth=2,
                                  camera_mode="pinhole", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, secondary):
        return render_loss(params, scene, cam, target, ids, key, width=W,
                           height=H, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           secondary_samples=secondary, secondary_spheres=1)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 64))(params)

    eps = 0.02
    checks = [("radii", (1,), 0.06, None),
              ("centers", (1, 1), 0.12, None),
              ("centers", (1, 2), 0.25, None),
              ("centers", (1, 0), None, 5e-3)]
    for leaf, idx, rtol, atol in checks:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0) - loss_of(dn, 0)) / (2 * eps))
        ad = float(g[leaf][idx])
        if rtol is not None:
            assert fd != 0.0
            assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)
        else:
            assert abs(ad - fd) < atol, (leaf, idx, ad, fd)


def two_bounce_scene() -> Scene:
    """Ground + big bright lambert reflector B (out of frustum, filling a
    chunk of the viewed patch's sky) + black occluder C above the patch
    (out of frustum). C shades BOTH the ground directly (vertex-depth-0
    edges) and B's near face, which re-lights the ground (vertex-depth-1
    edges) -- so the depth-0 secondary term alone UNDERSHOOTS the true
    gradient and vertex_depth 1 must close the gap."""
    return Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [2.2, 1.2, -1.2],
                           [0.0, 1.5, -1.2]], jnp.float32),
        radii=jnp.array([100.0, 1.8, 0.4], jnp.float32),
        material_index=jnp.array([0, 1, 2], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.55, 0.55, 0.55], [0.95, 0.95, 0.95],
                          [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0, 0.0, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0, 1.0], jnp.float32),
    )


@pytest.mark.slow
def test_vertex_depth1_term_is_nonzero_and_depth0_unchanged():
    """Fast control for the deeper-vertex extension: summing vertex
    depths {0,1} adds a nonzero, finite depth-1 part on the occluder of
    the two-bounce scene (while interior AD stays exactly zero). The
    depth-0 FD parity under depths=2 is covered by the slow
    test_secondary_vertex_depth1_closes_fd_gap."""
    w, h = 48, 36
    scene = two_bounce_scene()
    cam = shadow_cam(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    def loss_of(params, depths):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=w, height=h, spp=2,
                           max_depth=3, camera_mode="pinhole",
                           options=DEFAULT, secondary_samples=16,
                           secondary_spheres=2,
                           secondary_vertex_depths=depths)

    params = {"centers": scene.centers, "radii": scene.radii}
    g1 = jax.grad(lambda p: loss_of(p, 1))(params)
    g2 = jax.grad(lambda p: loss_of(p, 2))(params)
    assert np.isfinite(np.asarray(g2["centers"])).all()
    assert np.isfinite(np.asarray(g2["radii"])).all()
    # The depth-1 addition changes the occluder gradient...
    assert float(jnp.abs(g2["radii"][2] - g1["radii"][2])) > 0.0
    # ...and interior AD still measures exactly zero on it.
    g0 = jax.grad(lambda p: render_loss(
        p, scene, cam, target, ids, jax.random.key(3), width=w, height=h,
        spp=2, max_depth=3, camera_mode="pinhole", options=DEFAULT))(params)
    np.testing.assert_array_equal(np.asarray(g0["centers"][2]), 0.0)


@pytest.mark.slow
def test_receiver_motion_boundary_matches_finite_differences():
    """FD parity for the RECEIVER side of the shadow: gradients w.r.t.
    the GROUND (the sphere the shadow falls on) need the vertex-motion
    component of the edge term -- the vertex y(theta) rides the receiver,
    sweeping every silhouette it sees. The estimator attaches the final
    hop (closest_hit/hit_surface on the attached scene), measured to
    close a 17% systematic undershoot (AD -0.0462 vs FD -0.0556+-0.001
    on both c_y and radius with the vertex detached) to ~1.5%. Interior
    AD + the primary (horizon) term alone cannot: the undershoot is the
    shadow-sweep term itself."""
    scene = Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [0.0, 1.5, -1.0]],
                          jnp.float32),
        radii=jnp.array([100.0, 0.4], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0], jnp.float32),
    )
    cam = pinhole_cam()
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=W, height=H,
                                  spp=spp, wave_spp=spp, max_depth=2,
                                  camera_mode="pinhole", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, boundary, secondary):
        return render_loss(params, scene, cam, target, ids, key, width=W,
                           height=H, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           boundary_samples=boundary,
                           secondary_samples=secondary,
                           secondary_spheres=2)

    params = {"centers": scene.centers, "radii": scene.radii}
    g = jax.grad(lambda p: loss_of(p, 2048, 64))(params)

    eps = 0.02
    for leaf, idx, rtol in [("centers", (0, 1), 0.05), ("radii", (0,), 0.05)]:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0, 0) - loss_of(dn, 0, 0)) / (2 * eps))
        ad = float(g[leaf][idx])
        assert fd != 0.0
        assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)


@pytest.mark.slow
def test_secondary_vertex_depth1_closes_fd_gap():
    """The DISCRIMINATING multi-bounce FD test: on the two-bounce scene
    the depth-0 secondary term alone systematically undershoots central
    finite differences (measured -11% on the occluder radius, -27% on
    c_y -- far outside the +-1.5% FD key-to-key repeatability), while
    summing vertex depths {0, 1} lands within FD noise (2-6% across AD
    keys). Asserts both the gap and its closure."""
    scene = two_bounce_scene()
    cam = shadow_cam(W, H)
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    base_img = render_pixels_impl(scene, cam, ids, key, width=W, height=H,
                                  spp=spp, wave_spp=spp, max_depth=3,
                                  camera_mode="pinhole", options=DEFAULT)
    target = base_img - 0.5

    def loss_of(params, secondary, depths):
        return render_loss(params, scene, cam, target, ids, key, width=W,
                           height=H, spp=spp, max_depth=3,
                           camera_mode="pinhole", options=DEFAULT,
                           secondary_samples=secondary,
                           secondary_spheres=2,
                           secondary_vertex_depths=depths)

    params = {"centers": scene.centers, "radii": scene.radii}
    g1 = jax.grad(lambda p: loss_of(p, 64, 1))(params)
    g2 = jax.grad(lambda p: loss_of(p, 64, 2))(params)

    eps = 0.04
    for leaf, idx, gap, rtol in [("radii", (2,), 4e-3, 0.08),
                                 ("centers", (2, 1), 2.5e-3, 0.12)]:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = float((loss_of(up, 0, 1) - loss_of(dn, 0, 1)) / (2 * eps))
        ad1 = float(g1[leaf][idx])
        ad2 = float(g2[leaf][idx])
        assert fd != 0.0
        # depth-0 alone measurably undershoots...
        assert abs(ad1 - fd) > gap, (leaf, idx, ad1, fd)
        # ...and depth {0,1} closes the gap to FD noise.
        assert np.isclose(ad2, fd, rtol=rtol), (leaf, idx, ad2, fd)


def test_fit_recovers_center_through_silhouette():
    """fit(boundary_samples=...) recovers a perturbed center when the ONLY
    signal is a silhouette shift (interior AD provably stays put -- see
    test_interior_ad_is_blind_to_the_silhouette)."""
    w, h = 64, 48
    cam = pinhole_cam(w, h)
    cfg = RenderConfig(width=w, height=h, spp=4, max_depth=2,
                       camera_mode="pinhole", options=DEFAULT)
    truth = black_sphere_scene(cx=0.18)
    target = render(truth, cam, cfg, jax.random.key(0))
    start = black_sphere_scene(cx=0.0)

    _, params, _, losses = fit(
        start, cam, target, cfg, which=("centers",), steps=40,
        learning_rate=2e-2, batch_pixels=w * h, spp=4,
        boundary_samples=192, base_key=jax.random.key(5))
    c = np.asarray(params["centers"])[0]
    assert abs(c[0] - 0.18) < 0.05, c  # moved 0 -> ~0.18
    assert abs(c[1]) < 0.05 and abs(c[2] + 1.5) < 0.08, c
    assert losses[-1] < losses[0] * 0.2


@pytest.mark.slow
def test_render_pixels_vjp_matches_finite_differences():
    """The LITERAL BASELINE pixel-gradient metric (BASELINE.md:32):
    d<u, I>/d(param) for an ARBITRARY per-pixel cotangent u via
    optim.render_pixels_vjp (not an MSE loss), FD-validated.

    u = a signed smoothly-varying cotangent (sin across the image plus a
    DC offset, mixed sign): arbitrary, NOT an MSE cotangent, yet smooth
    enough that the FD aggregate converges (a per-pixel-random-SIGN
    cotangent makes both the edge estimator and FD noise-dominated:
    adjacent edge pixels cancel, measured std ~ the value itself).
    Exactness anchor: render_pixels_vjp must agree BIT-exactly with
    render_loss's gradient at a synthetic target whose MSE cotangent
    equals u (2*diff/size == u), proving the direct API and the fit
    path share one gradient. Additional literal single-row checks: a
    one-hot cotangent on a sky pixel far from the silhouette must see
    ~zero geometry gradient, and on an edge pixel a nonzero one of the
    correct sign.
    """
    from raytracinginoneweekend_tpu.optim.inverse import render_pixels_vjp

    scene = black_sphere_scene()
    cam = pinhole_cam()
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spp = 64
    params = {"centers": scene.centers, "radii": scene.radii}
    kw = dict(width=W, height=H, spp=spp, max_depth=2,
              camera_mode="pinhole", options=DEFAULT)

    xs = (np.arange(W * H) % W) / W
    u = jnp.asarray(np.stack(
        [np.sin(2 * np.pi * xs) + 0.25] * 3, -1), jnp.float32)
    g, pixels = render_pixels_vjp(params, scene, cam, u, ids, key,
                                  boundary_samples=4096, **kw)
    assert np.isfinite(np.asarray(pixels)).all()

    # Exactness vs the (already FD-gated) loss path: target such that
    # the MSE cotangent 2*diff/size equals u bit-exactly.
    size = W * H * 3
    target = jnp.asarray(pixels) - 0.5 * size * u
    g_loss = jax.grad(render_loss)(params, scene, cam, target, ids, key,
                                   boundary_samples=4096, **kw)
    for leaf in params:
        np.testing.assert_array_equal(np.asarray(g[leaf]),
                                      np.asarray(g_loss[leaf]))

    from raytracinginoneweekend_tpu.render import render_pixels_impl

    def val_of(p):
        sc = scene._replace(**p)
        img = render_pixels_impl(sc, cam, ids, key, wave_spp=spp,
                                 differentiable=True, **kw)
        return float(jnp.sum(img * u))

    eps = 0.03
    for leaf, idx, rtol in [("centers", (0, 2), 0.1), ("radii", (0,), 0.1)]:
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        fd = (val_of(up) - val_of(dn)) / (2 * eps)
        ad = float(g[leaf][idx])
        assert fd != 0.0
        assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fd)

    # Literal near-one-pixel rows of the Jacobian. Sphere at (0, 0, -1.5),
    # r=0.5, pinhole at origin: a 3-pixel window straddling the rightmost
    # covered pixel on the middle row contains the silhouette curve; a
    # pixel 10 further right is pure sky.
    img = np.asarray(pixels).reshape(H, W, 3)
    row = H // 2
    covered = np.where(img[row, :, 2] < 0.1)[0]
    edge_x = int(covered.max())
    sky_x = min(edge_x + 12, W - 1)

    def onehot(xs_):
        u1 = np.zeros((W * H, 3), np.float32)
        for x in xs_:
            u1[row * W + x, 0] = 1.0
        return jnp.asarray(u1)

    g_edge, _ = render_pixels_vjp(
        params, scene, cam, onehot(range(edge_x - 1, edge_x + 2)), ids,
        key, boundary_samples=8192, **kw)
    g_sky, _ = render_pixels_vjp(params, scene, cam, onehot([sky_x]), ids,
                                 key, boundary_samples=8192, **kw)
    # Sky pixel: no silhouette crosses it -> geometry gradient ~ 0.
    assert abs(float(g_sky["radii"][0])) < 1e-4
    # Edge pixel: growing the radius darkens it (covers more of the
    # pixel; the sphere is black, sky channel-0 positive) -> d/dr < 0.
    edge_r = float(g_edge["radii"][0])
    assert edge_r < -1e-3, edge_r
