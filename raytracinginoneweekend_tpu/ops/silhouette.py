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
gradients. Defocus modes ("thinlens"/"cpu") use the central viewpoint,
an O(aperture) approximation; "pinhole"/"cuda" are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TraceOptions
from ..models.camera import Camera
from ..models.scene import Scene

TAG_EDGE_PHI = 101  # fold_in tags (disjoint from ops/rng.py's 0/1/2+b)
TAG_EDGE_PROBE = 102


def silhouette_points(centers, radii, eye, phis):
    """Exact silhouette points of each sphere from viewpoint ``eye``.

    Args:
      centers: (S, 3) f32 (differentiable).
      radii:   (S,) f32 (differentiable; sign ignored -- a negative-radius
               shell, quirk Q10, has the same silhouette as its mirror).
      eye:     (3,) camera viewpoint.
      phis:    (S, E) angles parameterizing each silhouette circle.

    Returns (p, valid): p (S, E, 3) world-space silhouette points;
    valid (S,) False where the viewpoint is inside the sphere (no
    silhouette).
    """
    rho = jnp.abs(radii)  # (S,)
    m = eye[None, :] - centers  # (S, 3)
    d2 = jnp.sum(m * m, axis=-1)
    d = jnp.sqrt(d2)
    valid = d > rho * (1.0 + 1e-6)
    d_safe = jnp.where(valid, d, 1.0)
    m_hat = m / d_safe[:, None]

    # Orthonormal frame (e1, e2) perpendicular to m_hat; the helper axis
    # switches to Y where m_hat is nearly X-aligned.
    near_x = jnp.abs(m_hat[:, 0]) > 0.9
    helper = jnp.where(near_x[:, None],
                       jnp.array([0.0, 1.0, 0.0])[None, :],
                       jnp.array([1.0, 0.0, 0.0])[None, :])
    e1 = jnp.cross(m_hat, helper)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(m_hat, e1)

    cos_a = jnp.clip(rho / d_safe, 0.0, 1.0 - 1e-7)  # n . m_hat at tangency
    sin_a = jnp.sqrt(1.0 - cos_a * cos_a)
    n = (cos_a[:, None, None] * m_hat[:, None, :]
         + sin_a[:, None, None] * (jnp.cos(phis)[..., None] * e1[:, None, :]
                                   + jnp.sin(phis)[..., None] * e2[:, None, :]))
    p = centers[:, None, :] + rho[:, None, None] * n
    return p, valid


def project_to_screen(cam: Camera, p, camera_mode: str):
    """World points -> (u, v) in [0,1]^2 screen space (+ validity).

    Inverts the reference's film mapping (camera.hxx:56): the ray for
    (u, v) has direction A + horizontal*u + vertical*(1-v) with
    A = lower_left - origin for the corrected modes and A = lower_left for
    the "cuda"/"cpu" quirk-Q11 modes (no -origin). A point p projects to
    the (u, v) whose direction is parallel to p - origin: a 3x3 solve done
    with the dual basis of (horizontal, vertical, film normal).

    Args:
      p: (..., 3) world points.
    Returns (uv (..., 2), valid (...,)): valid is False behind the camera
    or at grazing film angles.
    """
    if camera_mode in ("cuda", "cpu"):
        a_vec = cam.lower_left  # quirk Q11: direction never subtracts origin
    else:
        a_vec = cam.lower_left - cam.origin
    hor, ver = cam.horizontal, cam.vertical
    n_f = jnp.cross(hor, ver)

    g = p - cam.origin
    g_nf = jnp.sum(g * n_f, axis=-1)
    ok = jnp.abs(g_nf) > 1e-12
    s = jnp.sum(a_vec * n_f) / jnp.where(ok, g_nf, 1.0)
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


def _probe_directions(cam: Camera, uv, camera_mode: str):
    """Central (no-lens) ray origin/direction for screen points (..., 2)."""
    u, v = uv[..., 0], uv[..., 1]
    film = (cam.lower_left[None, :] + cam.horizontal[None, :] * u[..., None]
            + cam.vertical[None, :] * (1.0 - v)[..., None])
    o = jnp.broadcast_to(cam.origin, film.shape)
    if camera_mode in ("cuda", "cpu"):
        return o, film  # quirk Q11
    return o, film - cam.origin[None, :]


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

    # Silhouette curve and its screen projection, attached to theta.
    p, sphere_ok = silhouette_points(scene.centers, scene.radii, cam.origin,
                                     phis)
    x, proj_ok = project_to_screen(cam, p, camera_mode)  # (S, E, 2)

    # Curve tangent dx/dphi via one jvp through the same chain (detached).
    def x_of_phi(ph):
        pp, _ = silhouette_points(jax.lax.stop_gradient(scene.centers),
                                  jax.lax.stop_gradient(scene.radii),
                                  cam.origin, ph)
        xx, _ = project_to_screen(cam, pp, camera_mode)
        return xx

    _, tau = jax.jvp(x_of_phi, (phis,), (jnp.ones_like(phis),))
    x_det = jax.lax.stop_gradient(x)

    # Screen normal: rotate the tangent 90 degrees, oriented OUTWARD (away
    # from the projected center -- the projected region is convex).
    n_raw = jnp.stack([tau[..., 1], -tau[..., 0]], axis=-1)
    x_c, _ = project_to_screen(cam, jax.lax.stop_gradient(scene.centers),
                               camera_mode)  # (S, 2)
    outward = jnp.sum(n_raw * (x_det - x_c[:, None, :]), axis=-1)
    sign = jnp.where(outward >= 0.0, 1.0, -1.0)
    tau_norm = jnp.linalg.norm(n_raw, axis=-1)
    n_unit = (n_raw * sign[..., None]
              / jnp.maximum(tau_norm, 1e-12)[..., None])

    # Pixel lookup + on-screen mask.
    u, v = x_det[..., 0], x_det[..., 1]
    on_screen = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    valid = sphere_ok[:, None] & proj_ok & on_screen & (tau_norm > 1e-12)
    ix = jnp.clip((u * width).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip((v * height).astype(jnp.int32), 0, height - 1)
    pid = iy * width + ix
    cot = cot_image[pid.reshape(-1)].reshape(s_count, e, 3)

    # Probe radiance just inside/outside the edge. Common random numbers
    # (one key per edge sample, shared by both probes) cancel the path
    # noise wherever the two sides see the same geometry.
    uv_in = x_det - probe_delta * n_unit
    uv_out = x_det + probe_delta * n_unit
    o_in, d_in = _probe_directions(cam, uv_in, camera_mode)
    o_out, d_out = _probe_directions(cam, uv_out, camera_mode)
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
