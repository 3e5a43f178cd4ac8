import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.ops.intersect import (BIG, closest_hit,
                                                      hit_surface)

T_MIN = 0.008


def _single(o, d, centers, radii, **kw):
    t, idx, hit = closest_hit(jnp.asarray([o], jnp.float32),
                              jnp.asarray([d], jnp.float32),
                              jnp.asarray(centers, jnp.float32),
                              jnp.asarray(radii, jnp.float32), T_MIN, **kw)
    return float(t[0]), int(idx[0]), bool(hit[0])


def test_head_on_hit():
    # Ray at origin toward -z; unit sphere at (0,0,-2): near root t = 1.
    t, idx, hit = _single([0, 0, 0], [0, 0, -1], [[0, 0, -2]], [1.0])
    assert hit and idx == 0
    assert np.isclose(t, 1.0, rtol=1e-5)


def test_miss():
    t, idx, hit = _single([0, 0, 0], [0, 1, 0], [[0, 0, -2]], [1.0])
    assert not hit
    assert t >= float(BIG)


def test_far_root_when_inside():
    # Origin inside the sphere: near root negative, far root selected.
    t, _, hit = _single([0, 0, -2], [0, 0, -1], [[0, 0, -2]], [1.0])
    assert hit
    assert np.isclose(t, 1.0, rtol=1e-5)


def test_t_min_window():
    # Hit closer than t_min=0.008 is rejected; far root used instead.
    t, _, hit = _single([0, 0, -1.001], [0, 0, -1], [[0, 0, -2]], [1.0])
    assert hit
    assert np.isclose(t, 1.999, rtol=1e-4)


def test_closest_of_many_and_tie_break():
    centers = [[0, 0, -5], [0, 0, -3], [0, 0, -3]]
    radii = [1.0, 1.0, 1.0]
    t, idx, hit = _single([0, 0, 0], [0, 0, -1], centers, radii)
    assert hit
    assert np.isclose(t, 2.0, rtol=1e-5)
    assert idx == 1  # tie between spheres 1 and 2 keeps the earlier index


def test_negative_radius_normal_flips():
    # Hollow glass: r < 0 flips the normal inward (quirk Q10,
    # raytracer.hxx:71 normal = (p - c)/r).
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    centers = jnp.asarray([[0.0, 0.0, -2.0]])
    t, idx, hit = closest_hit(o, d, centers, jnp.asarray([-1.0]), T_MIN)
    assert bool(hit[0])
    assert np.isclose(float(t[0]), 1.0, rtol=1e-5)
    _, n = hit_surface(o, d, t, idx, hit, centers, jnp.asarray([-1.0]))
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)


def test_streamed_blocks_match_single_block():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(37, 3)).astype(np.float32) * 3
    radii = rng.uniform(0.2, 1.0, size=37).astype(np.float32)
    o = rng.normal(size=(64, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(64, 3)).astype(np.float32)

    t1, i1, h1 = closest_hit(jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(centers), jnp.asarray(radii), T_MIN,
                             sphere_block=512)
    t2, i2, h2 = closest_hit(jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(centers), jnp.asarray(radii), T_MIN,
                             sphere_block=8)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)  # XLA fuses the two paths differently; float reassociation
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_grad_t_wrt_center_matches_fd():
    import jax

    def tval(cz):
        centers = jnp.stack([jnp.zeros(()), jnp.zeros(()), cz])[None, :]
        t, _, _ = closest_hit(jnp.zeros((1, 3)),
                              jnp.asarray([[0.0, 0.0, -1.0]]),
                              centers, jnp.asarray([1.0]), T_MIN)
        return t[0]

    g = jax.grad(tval)(jnp.float32(-3.0))
    eps = 1e-3
    fd = (tval(jnp.float32(-3.0 + eps)) - tval(jnp.float32(-3.0 - eps))) / (
        2 * eps)
    assert np.isclose(float(g), float(fd), rtol=1e-3)
    assert np.isclose(float(g), -1.0, rtol=1e-4)  # head-on: dt/dcz = -1


def test_custom_vjp_matches_xla_autodiff():
    """closest_hit_diff's analytic backward must reproduce XLA's transpose
    of closest_hit for every differentiable input (away from grazing)."""
    import jax

    from raytracinginoneweekend_tpu.ops.intersect import closest_hit_diff

    rng = np.random.default_rng(11)
    centers = jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32) * 2)
    radii = jnp.asarray(rng.uniform(0.4, 1.2, size=9).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32) * 0.1)
    d = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))

    def loss_auto(o, d, c, r):
        t, idx, hit = closest_hit(o, d, c, r, T_MIN)
        return jnp.sum(jnp.where(hit, jnp.sin(t), 0.0))

    def loss_custom(o, d, c, r):
        t, idx, hit = closest_hit_diff(o, d, c, r, T_MIN)
        return jnp.sum(jnp.where(hit, jnp.sin(t), 0.0))

    ga = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(o, d, centers, radii)
    gc = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(o, d, centers, radii)
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=1e-5)
