"""Delta-lobe vertex gradients (ops/branchprob.py): RR branch flips and
direction-sweep edge terms, FD-validated on configs where interior AD is
provably blind.

All tolerances follow the FD-first discipline of tests/test_silhouette.py:
FD was measured across keys first, AD asserts land within ~2x its
repeatability, and every slow test also asserts the term OFF measurably
MISSES (causality, not mere agreement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import (make_camera,
                                                      reference_cuda_camera)
from raytracinginoneweekend_tpu.models.scene import (DIELECTRIC, LAMBERT,
                                                     METAL, Scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.optim import render_loss
from raytracinginoneweekend_tpu.render import render_pixels_impl


def lone_glass_scene() -> Scene:
    """A single glass sphere against the sky. At max_depth=2 the refract
    branch ends BLACK (budget exhausted inside the glass), so the pixel
    value is exactly p_reflect * sky: the whole ior dependence is the RR
    decision probability, invisible to interior AD."""
    return Scene(
        centers=jnp.array([[0.0, 0.0, -2.0]], jnp.float32),
        radii=jnp.array([0.6], jnp.float32),
        material_index=jnp.array([0], jnp.int32),
        mtype=jnp.array([DIELECTRIC], jnp.int32),
        albedo=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        fuzz=jnp.array([0.0], jnp.float32),
        ior=jnp.array([1.5], jnp.float32),
    )


def perfect_mirror_scene() -> Scene:
    """Fuzz-0 metal ground + black occluder out of frustum on the mirror
    direction: the occluder affects the image ONLY through the swept
    reflection edge -- a delta lobe the density-based secondary term
    cannot cover (ops/silhouette.py's documented gap)."""
    return Scene(
        centers=jnp.array([[0.0, -100.5, -1.0], [0.0, 0.49, -2.69]],
                          jnp.float32),
        radii=jnp.array([100.0, 0.3], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([METAL, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.7, 0.7, 0.7], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0, 0.0], jnp.float32),
        ior=jnp.array([1.0, 1.0], jnp.float32),
    )


def shadow_cam(w, h):
    return make_camera((0, 0.5, 0.3), (0, -0.5, -1.2), (0, 1, 0), w / h,
                       40.0, 0.0, 1.0)


def _fd(loss_of, params, leaf, idx, eps, keys=(3, 5, 7)):
    out = []
    for kk in keys:
        k2 = jax.random.key(kk)
        up = dict(params)
        up[leaf] = params[leaf].at[idx].add(eps)
        dn = dict(params)
        dn[leaf] = params[leaf].at[idx].add(-eps)
        out.append(float((loss_of(up, False, k2) - loss_of(dn, False, k2))
                         / (2 * eps)))
    return out


def test_rr_interior_blind_and_term_finite():
    """Control: on the lone-glass config interior AD measures EXACTLY
    zero for ior; rr_grad produces a nonzero finite gradient."""
    w, h = 48, 36
    scene = lone_glass_scene()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), w / h, 40.0, 0.0,
                      1.0)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    def loss_of(params, rr):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=w, height=h, spp=4,
                           max_depth=2, camera_mode="pinhole",
                           options=DEFAULT, rr_grad=rr)

    params = {"ior": scene.ior}
    g0 = jax.grad(lambda p: loss_of(p, False))(params)
    assert float(g0["ior"][0]) == 0.0
    g1 = jax.grad(lambda p: loss_of(p, True))(params)
    assert np.isfinite(float(g1["ior"][0]))
    assert abs(float(g1["ior"][0])) > 0.0

    # The reference-compat refract expression is honored by the probes/
    # chain too (finite, nonzero under REFERENCE_CUDA).
    from raytracinginoneweekend_tpu.config import REFERENCE_CUDA

    def loss_ref(params):
        return render_loss(params, scene, cam, target, ids,
                           jax.random.key(3), width=w, height=h, spp=4,
                           max_depth=2, camera_mode="cuda",
                           options=REFERENCE_CUDA, rr_grad=True)

    g2 = jax.grad(loss_ref)(params)
    assert np.isfinite(float(g2["ior"][0]))
    assert abs(float(g2["ior"][0])) > 0.0


def test_grazing_gate_is_conditional_on_boundary_term():
    """The grazing-entry gate is ablation-only (VERDICT r4 weak #1: the
    unconditional r4 gate collapsed rr_grad-only glass-ior gradients to
    58% of FD; the round-5 CRN ownership study then refuted the gate
    outright -- docs/RIM_OWNERSHIP_r05.json). Pins three facts: the
    DEFAULT keeps the full sweep (production path is ungated); the
    ablation knob, when threaded, measurably cedes rim mass; and the
    ceded band scales with the threaded fraction (no hard-coded
    0.15)."""
    from raytracinginoneweekend_tpu.ops.branchprob import (
        branch_probability_surrogate)
    from raytracinginoneweekend_tpu.ops.silhouette import PROBE_DIEL_FRAC

    # The glass-on-black rim-zoom reproducer (test_silhouette's glass-rim
    # config): the frame is exactly the band the gate cedes, so the
    # gated/ungated sweep gradients must differ there.
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
    cot = jnp.ones((w * h, 3), jnp.float32)
    key = jax.random.key(5)

    def sur(params, **kw):
        sc = scene._replace(radii=params["radii"])
        return branch_probability_surrogate(
            sc, cam, "pinhole", cot, ids, w, h, key, 6, DEFAULT,
            _rr_term=False, **kw)

    params = {"radii": scene.radii}
    g_default = float(jax.grad(lambda p: sur(p))(params)["radii"][0])
    g_full = float(jax.grad(
        lambda p: sur(p, boundary_rim_frac=None))(params)["radii"][0])
    g_gated = float(jax.grad(
        lambda p: sur(p, boundary_rim_frac=PROBE_DIEL_FRAC)
    )(params)["radii"][0])
    g_narrow = float(jax.grad(
        lambda p: sur(p, boundary_rim_frac=0.002))(params)["radii"][0])

    # Default == ungated (rr_grad-only callers keep every sweep lane).
    assert g_default == g_full
    # The gate is live: ceding the rim band moves the sweep gradient.
    assert abs(g_full - g_gated) > 1e-4 * max(abs(g_full), 1e-3), (
        g_full, g_gated)
    # The band tracks the THREADED fraction, not a baked-in constant: a
    # near-zero fraction keeps lanes the 0.15 band cedes on this
    # rim-zoom frame.
    assert abs(g_narrow - g_gated) > 1e-4 * max(abs(g_narrow), 1e-3), (
        g_narrow, g_gated)

    # sweep_redraws (round 5, VERDICT r4 #4): the M-fold re-jitter arm
    # engages (different samples of the same expectation -> a different
    # finite value) and stays finite. Bias insensitivity is the measured
    # artifact docs/CHAIN_SWEEP_r05.json; this pins the mechanics.
    g_rd = float(jax.grad(
        lambda p: sur(p, sweep_redraws=2))(params)["radii"][0])
    assert np.isfinite(g_rd)
    assert g_rd != 0.0
    assert g_rd != g_full


def test_rr_grad_arms_threads_through_render_loss():
    """rr_grad_arms (round 5, the delta-lobe cost-policy knob --
    docs/RR_ARMS_COST_r05.json) must reach branchprob's chain_rr_arms:
    arms=0 measurably drops the side-chain mass vs the default 2 on a
    glass config, and both stay finite."""
    w, h = 48, 27
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    def g(arms):
        def loss_of(params):
            return render_loss(params, scene, cam, target, ids,
                               jax.random.key(3), width=w, height=h,
                               spp=4, max_depth=6, camera_mode="pinhole",
                               options=DEFAULT, rr_grad=True,
                               rr_grad_arms=arms)
        return float(jax.grad(loss_of)({"ior": scene.ior})["ior"][2])

    g0, g2 = g(0), g(2)
    assert np.isfinite(g0) and np.isfinite(g2)
    assert g0 != g2, (g0, g2)


@pytest.mark.slow
def test_rr_branch_flip_matches_finite_differences():
    """FD parity of the pure RR term: lone glass at depth 2, where the
    analytic pixel value is p_reflect(ior) * sky. Measured FD across
    keys: +0.0424..+0.0449; AD +0.0464 (the probe's slight depth-budget
    mismatch is inside the tolerance)."""
    w, h = 64, 48
    scene = lone_glass_scene()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), w / h, 40.0, 0.0,
                      1.0)
    key = jax.random.key(3)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base = render_pixels_impl(scene, cam, ids, key, width=w, height=h,
                              spp=spp, wave_spp=spp, max_depth=2,
                              camera_mode="pinhole", options=DEFAULT)
    target = base - 0.5

    def loss_of(params, rr, k=key):
        return render_loss(params, scene, cam, target, ids, k, width=w,
                           height=h, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           rr_grad=rr)

    params = {"ior": scene.ior}
    g = jax.grad(lambda p: loss_of(p, True))(params)
    fds = _fd(loss_of, params, "ior", (0,), 0.01)
    ad = float(g["ior"][0])
    fd = float(np.mean(fds))
    assert fd != 0.0
    # Interior AD alone is exactly zero here (control test): the term IS
    # the gradient.
    assert np.isclose(ad, fd, rtol=0.12), (ad, fds)


@pytest.mark.slow
def test_mirror_sweep_matches_finite_differences():
    """FD parity of the direction-sweep term at a PERFECT mirror: the
    occluder is visible only in the fuzz-0 reflection (interior AD and
    the density-based secondary term are both zero there). Measured FD
    across keys: c_y +0.0078..+0.0090, r -0.1111..-0.1126,
    c_z -0.0058..-0.0064; AD lands at +0.0085 / -0.1121 / -0.0057."""
    w, h = 96, 72
    scene = perfect_mirror_scene()
    cam = shadow_cam(w, h)
    key = jax.random.key(3)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base = render_pixels_impl(scene, cam, ids, key, width=w, height=h,
                              spp=spp, wave_spp=spp, max_depth=2,
                              camera_mode="pinhole", options=DEFAULT)
    target = base - 0.5

    def loss_of(params, rr, k=key):
        return render_loss(params, scene, cam, target, ids, k, width=w,
                           height=h, spp=spp, max_depth=2,
                           camera_mode="pinhole", options=DEFAULT,
                           rr_grad=rr)

    params = {"centers": scene.centers, "radii": scene.radii}
    g0 = jax.grad(lambda p: loss_of(p, False))(params)
    np.testing.assert_array_equal(np.asarray(g0["centers"][1]), 0.0)
    g = jax.grad(lambda p: loss_of(p, True))(params)

    for leaf, idx, eps, rtol in [("radii", (1,), 0.02, 0.05),
                                 ("centers", (1, 1), 0.02, 0.15),
                                 ("centers", (1, 2), 0.02, 0.15)]:
        fds = _fd(loss_of, params, leaf, idx, eps)
        ad = float(g[leaf][idx])
        fd = float(np.mean(fds))
        assert fd != 0.0
        assert np.isclose(ad, fd, rtol=rtol), (leaf, idx, ad, fds)


@pytest.mark.slow
def test_chain_sweep_carries_interface_albedo():
    """A TINTED dielectric attenuates every chain interface visit in the
    real renderer (attenuation *= albedo[mi] per refraction), so the
    direction-sweep edge weight must carry the chain's albedo product.
    Config: pinhole camera straight through a tinted glass sphere onto a
    black occluder's edge -- the sweep contribution passes the entry
    vertex (albedo in `thru`) plus exactly ONE chain interface (the
    exit), so scaling the glass albedo by a scales the sweep gradient by
    a^2 exactly (the reflect branch's a^1 family carries only the ~4%
    near-normal Schlick weight; probes never re-enter the glass). A
    chain unaware of interface albedo would scale as a^1."""
    from raytracinginoneweekend_tpu.ops.branchprob import (
        branch_probability_surrogate)

    w, h = 32, 24

    def scene_of(a):
        return Scene(
            centers=jnp.array([[0.0, 0.0, -3.0], [0.0, 1.5, -8.0]],
                              jnp.float32),
            radii=jnp.array([1.0, 2.0], jnp.float32),
            material_index=jnp.array([0, 1], jnp.int32),
            mtype=jnp.array([DIELECTRIC, LAMBERT], jnp.int32),
            albedo=jnp.array([[a, a, a], [0.0, 0.0, 0.0]], jnp.float32),
            fuzz=jnp.zeros(2, jnp.float32),
            ior=jnp.array([1.5, 1.0], jnp.float32))

    cam = make_camera((0, 0, 0), (0, 0, -3), (0, 1, 0), w / h, 40.0,
                      0.0, 1.0)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    cot = jnp.ones((w * h, 3), jnp.float32) / (w * h)

    def sweep_grad(a):
        def f(p):
            s = scene_of(a)
            s = s._replace(centers=s.centers.at[1, 1].add(p))
            return branch_probability_surrogate(
                s, cam, "pinhole", cot, ids, w, h, jax.random.key(5), 4,
                DEFAULT, vertex_depth=0, _rr_term=False, chain_rr_arms=0)

        return float(jax.grad(f)(0.0))

    g1 = sweep_grad(1.0)
    g5 = sweep_grad(0.5)
    assert abs(g1) > 1e-3  # the edge term actually fires
    np.testing.assert_allclose(g5 / g1, 0.25, atol=0.02)


def test_fit_recovers_ior_through_delta_terms():
    """Inverse rendering capstone: fit() recovers the hollow glass's ior
    (perturbed 1.5 -> 1.25) from pixels ONLY when the delta-lobe terms
    supply the gradient. Measured: with rr_grad the optimum lands at
    1.494 (loss 0.0112 -> 0.0020); without it adam stalls at 1.41 (the
    interior term alone under-signals)."""
    from raytracinginoneweekend_tpu.config import RenderConfig
    from raytracinginoneweekend_tpu.optim import fit
    from raytracinginoneweekend_tpu.render import render

    w, h = 96, 54
    cam = reference_cuda_camera(w, h)
    cfg = RenderConfig(width=w, height=h, spp=16, max_depth=6,
                       camera_mode="pinhole", options=DEFAULT)
    truth = simple_scene_cuda()
    target = render(truth, cam, cfg, jax.random.key(0))
    start = truth._replace(ior=truth.ior.at[2].set(1.25))

    _, p_rr, _, losses_rr = fit(
        start, cam, target, cfg, which=("ior",), steps=60,
        learning_rate=2e-2, batch_pixels=w * h, spp=16, rr_grad=True,
        secondary_vertex_depths=3, base_key=jax.random.key(5))
    assert abs(float(p_rr["ior"][2]) - 1.5) < 0.03, p_rr["ior"]
    assert losses_rr[-1] < losses_rr[0] * 0.3

    _, p0, _, _ = fit(
        start, cam, target, cfg, which=("ior",), steps=60,
        learning_rate=2e-2, batch_pixels=w * h, spp=16, rr_grad=False,
        secondary_vertex_depths=3, base_key=jax.random.key(5))
    # Control: without the terms the recovery measurably stalls.
    assert abs(float(p0["ior"][2]) - 1.5) > 0.05, p0["ior"]


@pytest.mark.slow
def test_hollow_glass_ior_matches_finite_differences():
    """The flagship delta-chain case: the simple scene's HOLLOW glass
    sphere (4 refracting interfaces -- a compound lens). Interior AD
    reports ~1% of the true ior gradient (+0.0007 vs FD +0.066+-0.002);
    with rr_grad (RR flips at every interface depth + the chain-followed
    direction-sweep term) AD lands at +0.063..+0.068 across its keys.
    Also asserts the miss WITHOUT the term (causality)."""
    w, h = 96, 54
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(3)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base = render_pixels_impl(scene, cam, ids, key, width=w, height=h,
                              spp=spp, wave_spp=spp, max_depth=6,
                              camera_mode="pinhole", options=DEFAULT)
    target = base - 0.5

    def loss_of(params, rr, k=key):
        return render_loss(params, scene, cam, target, ids, k, width=w,
                           height=h, spp=spp, max_depth=6,
                           camera_mode="pinhole", options=DEFAULT,
                           rr_grad=rr, secondary_vertex_depths=3)

    params = {"ior": scene.ior}
    g0 = jax.grad(lambda p: loss_of(p, False))(params)
    g = jax.grad(lambda p: loss_of(p, True))(params)
    fds = _fd(loss_of, params, "ior", (2,), 0.015)
    fd = float(np.mean(fds))
    ad0 = float(g0["ior"][2])
    ad = float(g["ior"][2])
    assert fd != 0.0
    # Interior AD alone captures almost nothing of the true gradient...
    assert abs(ad0 - fd) > 0.5 * abs(fd), (ad0, fd)
    # ...and the delta-lobe terms close it to FD repeatability.
    assert np.isclose(ad, fd, rtol=0.15), (ad, fds)


@pytest.mark.slow
def test_internal_rr_reflection_arm_matches_finite_differences():
    """The round-3 scope extension: internal-RR REFLECTION arms of the
    deterministic refract chain carry their own direction-sweep edge
    term (branch_probability_surrogate(chain_rr_arms=K)).

    Config built so the arm term is load-bearing: a glass sphere in
    front of the camera and a BLACK occluder BEHIND the camera --
    invisible to primaries, seen only by backward-exiting glass paths:
    the br=0 primary-reflection branch (covered with or without arms)
    and the internally-reflected exit arms (covered only by
    chain_rr_arms > 0). Batch = the glass disk's pixels; the loss
    gradient w.r.t. the occluder RADIUS (coherent sign around the whole
    edge ring, unlike lateral motion which cancels across the ring) is
    measured against central FD at 256 spp.

    Measured on this config (eps 0.04/0.08 FD: -0.004821/-0.004787):
    arms=0 reports -0.00225 -- 47% of the truth -- while arms=2 gives
    -0.00494, within 2.5% of FD. The assertions bound both facts.
    """
    from raytracinginoneweekend_tpu.models.camera import make_camera
    from raytracinginoneweekend_tpu.models.scene import DIELECTRIC, LAMBERT
    from raytracinginoneweekend_tpu.ops.branchprob import (
        branch_probability_surrogate)
    from raytracinginoneweekend_tpu.render import render_pixels_impl
    import raytracinginoneweekend_tpu.ops.silhouette as sil

    w, h, spp, depth = 96, 72, 256, 8

    def make_scene(orad):
        return Scene(
            centers=jnp.array([[0.0, 0.0, -3.0], [0.0, 0.1, 1.2]],
                              jnp.float32),
            radii=jnp.stack([jnp.float32(1.0), orad]),
            material_index=jnp.array([0, 1], jnp.int32),
            mtype=jnp.array([DIELECTRIC, LAMBERT], jnp.int32),
            albedo=jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]],
                             jnp.float32),
            fuzz=jnp.array([0.0, 0.0], jnp.float32),
            ior=jnp.array([1.5, 1.0], jnp.float32),
        )

    cam = make_camera((0, 0, 0), (0, 0, -3), (0, 1, 0), w / h, 45.0, 0.0,
                      3.0)
    key = jax.random.key(3)
    ys, xs = np.mgrid[0:h, 0:w]
    uu = (xs + 0.5) / w
    vv = (ys + 0.5) / h
    uv_c, _ = sil.project_to_screen(cam, jnp.array([[0., 0., -3.]]),
                                    "pinhole")
    uv_e, _ = sil.project_to_screen(cam, jnp.array([[1., 0., -3.]]),
                                    "pinhole")
    uc, vc = float(uv_c[0, 0]), float(uv_c[0, 1])
    ru = abs(float(uv_e[0, 0]) - uc)
    m = ((uu - uc) / ru) ** 2 + ((vv - vc) / ru) ** 2 < 0.95 ** 2
    ids = jnp.asarray(np.where(m.ravel())[0].astype(np.int32))
    kw = dict(width=w, height=h, spp=spp, max_depth=depth,
              camera_mode="pinhole", options=DEFAULT)

    def rendered(sc):
        return render_pixels_impl(sc, cam, ids, key, wave_spp=spp,
                                  differentiable=True, **kw)

    base = rendered(make_scene(jnp.float32(0.8)))
    target = jax.lax.stop_gradient(base) - 0.5
    size = base.size

    def loss_of(orad, arms):
        sc = make_scene(orad)
        diff = rendered(sc) - target
        loss = jnp.mean(diff * diff)
        if arms is None:
            return loss
        cot = 2.0 * jax.lax.stop_gradient(diff) / size
        sur = branch_probability_surrogate(
            sc, cam, "pinhole", cot, ids, w, h,
            jax.random.fold_in(key, 0x51172), depth, DEFAULT,
            chain_rr_arms=arms)
        return loss + sur - jax.lax.stop_gradient(sur)

    g0 = float(jax.grad(lambda r: loss_of(r, 0))(jnp.float32(0.8)))
    g2 = float(jax.grad(lambda r: loss_of(r, 2))(jnp.float32(0.8)))
    eps = 0.06
    fd = float((loss_of(jnp.float32(0.8 + eps), None)
                - loss_of(jnp.float32(0.8 - eps), None)) / (2 * eps))
    assert fd < -1e-3, fd  # the config carries real signal
    # New term closes the gap; refract-chain-only measurably misses.
    assert abs(g2 - fd) < 0.15 * abs(fd), (g2, fd)
    assert abs(g0 - fd) > 0.35 * abs(fd), (g0, fd)


@pytest.mark.slow
def test_mirror_chain_prefix_attachment_reduces_bias():
    """MEASURED-BOUND reproducer for the mirror-prefix chain family (the
    round-4 delta-lobe scope experiment; ops/branchprob.py docstring
    "residual out-of-scope" list).

    Config: a huge flat-ish MIRROR ground steers the camera onto a glass
    sphere with a black occluder above it. Expected-value FD says the
    mirror-center gradient is ~0.002 +- 0.001; the round-3 detached vd0
    direction-sweep term claimed +0.13 +- 0.04. Two round-4 estimator
    improvements each cut it (per-lane diagnostic in ARCHITECTURE.md
    "Chain-sweep bias decomposition"): attaching the vertex-walk prefix
    adds the vd1 RR incidence channel (bias 0.13 -> 0.059), and the
    DIELECTRIC-RIM DEEP PROBE (probe_delta_diel) captures the glass-rim
    crossing family whose radiance step hides past the grazing band
    (0.059 -> 0.031). This test pins (a) the truth being small, (b) the
    attachment reducing the bias, (c) the deep probe adding its negative
    rim mass on every seed, and (d) the residual bias still existing
    (magnified exit-cone crossings + RR-threshold flips, measured
    bounds in ops/branchprob.py) -- if a future estimator closes it,
    update the docstring scope list and tighten this test.
    """
    from raytracinginoneweekend_tpu.ops.branchprob import (
        branch_probability_surrogate)

    w, h = 48, 36
    scene = Scene(
        centers=jnp.array([[0.0, -100.0, -2.0],
                           [0.0, 1.6, -2.0],
                           [0.0, 4.6, -2.0]], jnp.float32),
        radii=jnp.array([100.0, 0.8, 1.6], jnp.float32),
        material_index=jnp.array([0, 1, 2], jnp.int32),
        mtype=jnp.array([METAL, DIELECTRIC, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.9, 0.9, 0.9], [1.0, 1.0, 1.0],
                          [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.zeros(3, jnp.float32),
        ior=jnp.array([1.0, 1.5, 1.0], jnp.float32),
    )
    cam = make_camera((0.0, 1.2, 0.8), (0.0, 0.0, -2.0), (0, 1, 0),
                      w / h, 45.0, 0.0, 1.0)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    spp = 64
    base_key = jax.random.key(3)
    base = render_pixels_impl(scene, cam, ids, base_key, width=w, height=h,
                              spp=spp, wave_spp=spp, max_depth=4,
                              camera_mode="pinhole", options=DEFAULT)
    target = base - 0.5

    # (a) expected-value FD across render keys: the truth is ~0.
    def mse(cy, rkey):
        s = scene._replace(centers=scene.centers.at[0, 1].add(cy))
        img = render_pixels_impl(s, cam, ids, rkey, width=w, height=h,
                                 spp=spp, wave_spp=spp, max_depth=4,
                                 camera_mode="pinhole", options=DEFAULT)
        return float(jnp.mean((img - target) ** 2))

    eps = 0.05
    fds = np.array([(mse(eps, jax.random.key(200 + k))
                     - mse(-eps, jax.random.key(200 + k))) / (2 * eps)
                    for k in range(4)])
    assert abs(fds.mean()) < 0.012, fds

    # (b)/(c)/(d) AD totals with the delta-lobe terms.
    def ad(skey, detach, **kw):
        def f(params):
            s = scene._replace(**params)
            img = render_pixels_impl(s, cam, ids, base_key, width=w,
                                     height=h, spp=spp, wave_spp=spp,
                                     max_depth=4, camera_mode="pinhole",
                                     options=DEFAULT, differentiable=True)
            diff = img - target
            val = jnp.mean(diff * diff)
            cot = 2.0 * jax.lax.stop_gradient(diff) / diff.size
            for b in (0, 1):
                sur = branch_probability_surrogate(
                    s, cam, "pinhole", cot, ids, w, h,
                    jax.random.fold_in(skey, 0x8800 + b), 4, DEFAULT,
                    vertex_depth=b, _detach_prefix=detach, **kw)
                val = val + sur - jax.lax.stop_gradient(sur)
            return val

        return float(jax.grad(f)({"centers": scene.centers})
                     ["centers"][0, 1])

    att = np.array([ad(jax.random.key(100 + k), False) for k in range(3)])
    det = np.array([ad(jax.random.key(100 + k), True) for k in range(3)])
    truth = fds.mean()
    bias_att = abs(att.mean() - truth)
    bias_det = abs(det.mean() - truth)
    assert bias_att < 0.75 * bias_det, (att, det, truth)  # (b) reduction
    # (c) the dielectric-rim deep probe adds its (negative) rim-crossing
    # mass on EVERY seed vs the shallow-probe ablation (paired: the
    # draw keys are identical, only the inner probe depth differs).
    att_sh = np.array([ad(jax.random.key(100 + k), False,
                          probe_delta_diel=2e-3) for k in range(3)])
    assert (att < att_sh + 5e-3).all(), (att, att_sh)
    assert bias_det > 0.05, (det, truth)  # (d) the documented residual
