"""Edge-sampled silhouette gradients: the visibility boundary term.

The rendered image is discontinuous in sphere centers/radii at silhouettes
(the hit/miss flip of ``raytracer::intersect``'s discriminant,
raytracer.hxx:52-92): interior automatic differentiation of the integrator
sees only the smooth shading term and misses the boundary term entirely,
so gradients w.r.t. geometry cannot move a silhouette (the classic
differentiable-rendering limitation; cf. Li et al. 2018 "Differentiable
Monte Carlo Ray Tracing through Edge Sampling" and Bangaru et al. 2020
warped-area reparameterization -- see PAPERS.md).

For sphere scenes the silhouette is ANALYTIC, so edge sampling needs no
edge-search data structure at all. For sphere (c, r) seen from the camera
origin o, the silhouette points are

    p(phi) = c + rho * n(phi),         rho = |r|
    n(phi) = (rho/D) m_hat + sqrt(1 - rho^2/D^2) (cos(phi) e1 + sin(phi) e2)

with m = o - c, D = |m| (the tangency condition n . m = rho: the viewing
ray at p grazes the sphere). Projecting p(phi) to the film gives the exact
screen-space silhouette curve x(phi; c, r), differentiable in (c, r).

The pixel-area integral's boundary term is then

    dI_pix/dtheta |_edge = W*H * oint_{edge in pix} (f_in - f_out)
                                                    (dx/dtheta . n_s) ds

(x in [0,1]^2 screen coordinates, pixel area 1/(W*H), n_s the screen-space
outward normal of the sphere's projected region, f_in/f_out the radiance
just inside/outside -- probed by tracing two rays offset +/-delta along
n_s, which also makes OCCLUDED edges contribute ~zero automatically: both
probes see the occluder, so f_in - f_out vanishes).

The term is delivered as a SURROGATE scalar whose jax.grad equals the
Monte-Carlo boundary estimate while its value is irrelevant (callers add
``surrogate - stop_gradient(surrogate)`` to the loss):

    surrogate = sum_e  w_e_detached * (x_e(theta) . n_e_detached)
    w_e = cot_pix(x_e) . (f_in - f_out) * |dx/dphi| * (2*pi/E) * W * H

Everything except ``x_e(theta)`` is detached, so d surrogate/d theta is
exactly the estimator above; the probe traces run on a stop_gradient'ed
scene (forward only).

Scope: the boundary is sampled from the CAMERA viewpoint (primary
visibility -- the dominant silhouette term). Secondary-bounce silhouettes
(a sphere's edge seen in a reflection) still carry interior-only
gradients. Defocus: "pinhole"/"cuda" are exact; "thinlens" integrates
the boundary term over the APERTURE as well -- each edge sample draws
its own lens point l, samples the silhouette as seen FROM l, projects
through l (the thin-lens map: p is seen through l at the (u, v) whose
film direction is parallel to p - l), and probes along rays through l.
The estimator is then unbiased for the lens-averaged pixel integral
E_l[I(l)] the renderer actually computes. The quirky "cpu" mode
(SURVEY Q2: lens offset scaled by the screen coordinate itself) keeps
the central-viewpoint O(aperture) approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TraceOptions
from ..models.camera import Camera
from ..models.scene import Scene

TAG_EDGE_PHI = 101  # fold_in tags (disjoint from ops/rng.py's 0/1/2+b)
TAG_EDGE_PROBE = 102
TAG_EDGE_LENS = 103


def silhouette_points(centers, radii, eye, phis):
    """Exact silhouette points of each sphere from viewpoint ``eye``.

    Args:
      centers: (S, 3) f32 (differentiable).
      radii:   (S,) f32 (differentiable; sign ignored -- a negative-radius
               shell, quirk Q10, has the same silhouette as its mirror).
      eye:     (3,) shared camera viewpoint, or (S, E, 3) per-sample
               viewpoints (lens integration).
      phis:    (S, E) angles parameterizing each silhouette circle.

    Returns (p, valid): p (S, E, 3) world-space silhouette points;
    valid (S, E) False where the viewpoint is inside the sphere (no
    silhouette).
    """
    e_count = phis.shape[1]
    rho = jnp.abs(radii)[:, None]  # (S, 1)
    eye = jnp.broadcast_to(eye, (centers.shape[0], e_count, 3))
    m = eye - centers[:, None, :]  # (S, E, 3)
    d = jnp.sqrt(jnp.sum(m * m, axis=-1))  # (S, E)
    valid = d > rho * (1.0 + 1e-6)
    d_safe = jnp.where(valid, d, 1.0)
    m_hat = m / d_safe[..., None]

    # Orthonormal frame (e1, e2) perpendicular to m_hat; the helper axis
    # switches to Y where m_hat is nearly X-aligned.
    near_x = jnp.abs(m_hat[..., 0]) > 0.9
    helper = jnp.where(near_x[..., None],
                       jnp.array([0.0, 1.0, 0.0]),
                       jnp.array([1.0, 0.0, 0.0]))
    e1 = jnp.cross(m_hat, helper)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(m_hat, e1)

    cos_a = jnp.clip(rho / d_safe, 0.0, 1.0 - 1e-7)  # n . m_hat at tangency
    sin_a = jnp.sqrt(1.0 - cos_a * cos_a)
    n = (cos_a[..., None] * m_hat
         + sin_a[..., None] * (jnp.cos(phis)[..., None] * e1
                               + jnp.sin(phis)[..., None] * e2))
    p = centers[:, None, :] + rho[..., None] * n
    return p, valid


def project_to_screen(cam: Camera, p, camera_mode: str, lens_offset=None):
    """World points -> (u, v) in [0,1]^2 screen space (+ validity).

    Inverts the reference's film mapping (camera.hxx:56): the ray for
    (u, v) from lens point origin+off has direction A + horizontal*u +
    vertical*(1-v) with A = lower_left - origin - off for the corrected
    modes and A = lower_left for the "cuda"/"cpu" quirk-Q11 modes (no
    -origin, no lens here). A point p projects to the (u, v) whose
    direction is parallel to p - (origin + off): a 3x3 solve done with
    the dual basis of (horizontal, vertical, film normal).

    Args:
      p: (..., 3) world points.
      lens_offset: optional (..., 3) thin-lens offsets from the origin.
    Returns (uv (..., 2), valid (...,)): valid is False behind the camera
    or at grazing film angles.
    """
    if camera_mode in ("cuda", "cpu"):
        a_vec = cam.lower_left  # quirk Q11: direction never subtracts origin
        eye = jnp.asarray(cam.origin)
    elif lens_offset is None:
        a_vec = cam.lower_left - cam.origin
        eye = jnp.asarray(cam.origin)
    else:
        a_vec = cam.lower_left - cam.origin - lens_offset  # (..., 3)
        eye = cam.origin + lens_offset
    hor, ver = cam.horizontal, cam.vertical
    n_f = jnp.cross(hor, ver)

    g = p - eye
    g_nf = jnp.sum(g * n_f, axis=-1)
    ok = jnp.abs(g_nf) > 1e-12
    s = jnp.sum(a_vec * n_f, axis=-1) / jnp.where(ok, g_nf, 1.0)
    # s > 0: p is on the forward side of the film direction.
    valid = ok & (s > 0.0)
    w = s[..., None] * g - a_vec

    h_star = jnp.cross(ver, n_f)
    h_star = h_star / jnp.sum(hor * h_star)
    v_star = jnp.cross(hor, n_f)
    v_star = v_star / jnp.sum(ver * v_star)
    u = jnp.sum(w * h_star, axis=-1)
    b = jnp.sum(w * v_star, axis=-1)
    return jnp.stack([u, 1.0 - b], axis=-1), valid


def _probe_directions(cam: Camera, uv, camera_mode: str, lens_offset=None):
    """Probe-ray origin/direction for screen points (..., 2).

    Central (no-lens) rays by default; through the given thin-lens
    offsets when ``lens_offset`` (..., 3) is passed.
    """
    u, v = uv[..., 0], uv[..., 1]
    film = (cam.lower_left[None, :] + cam.horizontal[None, :] * u[..., None]
            + cam.vertical[None, :] * (1.0 - v)[..., None])
    if camera_mode in ("cuda", "cpu"):
        o = jnp.broadcast_to(cam.origin, film.shape)
        return o, film  # quirk Q11
    if lens_offset is None:
        o = jnp.broadcast_to(cam.origin, film.shape)
        return o, film - cam.origin[None, :]
    o = jnp.broadcast_to(cam.origin + lens_offset, film.shape)
    return o, film - o


def boundary_surrogate(scene: Scene, cam: Camera, camera_mode: str,
                       cot_image, width: int, height: int, base_key,
                       max_depth: int, options: TraceOptions,
                       n_angles: int = 256, probe_delta: float | None = None):
    """Surrogate scalar whose gradient w.r.t. scene.centers/scene.radii is
    the edge-sampled visibility boundary term of the pixel loss.

    Args:
      scene: the ATTACHED scene (centers/radii carry tangents).
      cot_image: (width*height, 3) dL/dI per pixel (detached) -- zero for
        pixels outside the loss batch.
      base_key: PRNG key for angle stratification jitter + probe paths.
      n_angles: edge samples per sphere (E).
      probe_delta: screen-space half-offset of the two probe rays;
        default 0.3 pixels.
    Returns a scalar; add ``s - stop_gradient(s)`` to the loss.
    """
    from . import rng
    from .integrate import trace  # local: avoid an import cycle

    s_count = scene.num_spheres
    e = n_angles
    if probe_delta is None:
        probe_delta = 0.3 / max(width, height)

    # Stratified, jittered angles (unbiased over the circle; one jitter per
    # sphere so samples decorrelate across spheres).
    jit = jax.random.uniform(jax.random.fold_in(base_key, TAG_EDGE_PHI),
                             (s_count, 1))
    phis = (jnp.arange(e)[None, :] + jit) * (2.0 * jnp.pi / e)

    # Thin-lens aperture integration: each edge sample draws its own lens
    # point and the whole chain (silhouette viewpoint, projection, probe
    # rays) runs through it -- the MC average over samples is then the
    # lens-averaged boundary term. Other modes use the central viewpoint.
    # (static branch on the mode only: cam may be traced under jit, and a
    # zero aperture just draws zero offsets -- the central viewpoint.)
    if camera_mode == "thinlens":
        lu = jax.random.uniform(jax.random.fold_in(base_key, TAG_EDGE_LENS),
                                (s_count, e, 2))
        l0, l1 = rng.disk_from_uv(lu[..., 0], lu[..., 1])
        l0, l1 = l0 * cam.lens_radius, l1 * cam.lens_radius
        lens_off = (cam.basis_u[None, None, :] * l0[..., None]
                    + cam.basis_v[None, None, :] * l1[..., None])
        eye = cam.origin + lens_off
    else:
        lens_off = None
        eye = cam.origin

    # Silhouette curve and its screen projection, attached to theta.
    p, sphere_ok = silhouette_points(scene.centers, scene.radii, eye, phis)
    x, proj_ok = project_to_screen(cam, p, camera_mode, lens_off)  # (S,E,2)

    # Curve tangent dx/dphi via one jvp through the same chain (detached).
    def x_of_phi(ph):
        pp, _ = silhouette_points(jax.lax.stop_gradient(scene.centers),
                                  jax.lax.stop_gradient(scene.radii),
                                  eye, ph)
        xx, _ = project_to_screen(cam, pp, camera_mode, lens_off)
        return xx

    _, tau = jax.jvp(x_of_phi, (phis,), (jnp.ones_like(phis),))
    x_det = jax.lax.stop_gradient(x)

    # Screen normal: rotate the tangent 90 degrees, oriented OUTWARD (away
    # from the projected center -- the projected region is convex).
    n_raw = jnp.stack([tau[..., 1], -tau[..., 0]], axis=-1)
    x_c, _ = project_to_screen(
        cam,
        jnp.broadcast_to(jax.lax.stop_gradient(scene.centers)[:, None, :],
                         (s_count, e, 3)),
        camera_mode, lens_off)  # (S, E, 2)
    outward = jnp.sum(n_raw * (x_det - x_c), axis=-1)
    sign = jnp.where(outward >= 0.0, 1.0, -1.0)
    tau_norm = jnp.linalg.norm(n_raw, axis=-1)
    n_unit = (n_raw * sign[..., None]
              / jnp.maximum(tau_norm, 1e-12)[..., None])

    # Pixel lookup + on-screen mask.
    u, v = x_det[..., 0], x_det[..., 1]
    on_screen = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    valid = sphere_ok & proj_ok & on_screen & (tau_norm > 1e-12)
    ix = jnp.clip((u * width).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip((v * height).astype(jnp.int32), 0, height - 1)
    pid = iy * width + ix
    cot = cot_image[pid.reshape(-1)].reshape(s_count, e, 3)

    # Probe radiance just inside/outside the edge. Common random numbers
    # (one key per edge sample, shared by both probes) cancel the path
    # noise wherever the two sides see the same geometry.
    uv_in = x_det - probe_delta * n_unit
    uv_out = x_det + probe_delta * n_unit
    o_in, d_in = _probe_directions(cam, uv_in, camera_mode, lens_off)
    o_out, d_out = _probe_directions(cam, uv_out, camera_mode, lens_off)
    flat_idx = jnp.arange(s_count * e, dtype=jnp.int32)
    pkeys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.fold_in(base_key, TAG_EDGE_PROBE), flat_idx)
    scene_det = jax.lax.stop_gradient(scene)
    o_all = jnp.concatenate([o_in.reshape(-1, 3), o_out.reshape(-1, 3)])
    d_all = jnp.concatenate([d_in.reshape(-1, 3), d_out.reshape(-1, 3)])
    k_all = jnp.concatenate([pkeys, pkeys])
    f_all = trace(scene_det, jax.lax.stop_gradient(o_all),
                  jax.lax.stop_gradient(d_all), k_all, max_depth, options)
    f_in = f_all[:s_count * e].reshape(s_count, e, 3)
    f_out = f_all[s_count * e:].reshape(s_count, e, 3)

    # Per-sample detached weight; the only attached factor is x(theta).
    w = (jnp.sum(cot * (f_in - f_out), axis=-1)
         * tau_norm * (2.0 * jnp.pi / e) * (width * height))
    w = jnp.where(valid, w, 0.0)
    w = jax.lax.stop_gradient(w)
    return jnp.sum(w * jnp.sum(x * jax.lax.stop_gradient(n_unit), axis=-1))
