import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.ops import math3


def test_dot_cross_length():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([4.0, -5.0, 6.0])
    assert np.isclose(math3.dot(a, b), 4 - 10 + 18)
    np.testing.assert_allclose(math3.cross(a, b),
                               np.cross(np.array(a), np.array(b)), rtol=1e-6)
    assert np.isclose(math3.length(a), np.sqrt(14.0), rtol=1e-6)


def test_normalize_guard():
    # Zero vector stays zero (math.hxx:226 FLT_MIN guard), no NaN.
    z = math3.normalize(jnp.zeros(3))
    np.testing.assert_array_equal(np.asarray(z), np.zeros(3))
    v = math3.normalize(jnp.array([3.0, 0.0, 4.0]))
    np.testing.assert_allclose(np.asarray(v), [0.6, 0.0, 0.8], rtol=1e-6)


def test_reflect():
    i = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(math3.reflect(i, n)),
                               [1.0, 1.0, 0.0], atol=1e-7)


def test_refract_physical_straight_through():
    i = jnp.array([0.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    r, tir = math3.refract(i, n, 1.0)
    assert not bool(tir)
    np.testing.assert_allclose(np.asarray(r), [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_tir_mask_no_nan():
    # Shallow grazing exit from glass (eta = 1.5): total internal reflection.
    i = math3.normalize(jnp.array([1.0, -0.1, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    r, tir = math3.refract(i, n, 1.5)
    assert bool(tir)
    assert np.all(np.isfinite(np.asarray(r)))
    np.testing.assert_array_equal(np.asarray(r), np.zeros(3))


def test_refract_reference_quirk():
    # math.hxx:304-308: dot*eta is broadcast-added per component.
    i = math3.normalize(jnp.array([0.5, -1.0, 0.25]))
    n = jnp.array([0.0, 1.0, 0.0])
    eta = 0.7
    cos_i = float(math3.dot(n, i))
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    expect = np.asarray(i) * eta - (np.asarray(n) * np.sqrt(k) + cos_i * eta)
    r, tir = math3.refract_reference(i, n, eta)
    assert not bool(tir)
    np.testing.assert_allclose(np.asarray(r), expect, rtol=1e-6)
    # And it differs from the physical formula (the bug is real).
    r_phys, _ = math3.refract(i, n, eta)
    assert not np.allclose(np.asarray(r), np.asarray(r_phys))


def test_schlick():
    # Normal incidence on glass: R0 = ((1-1.5)/(1+1.5))^2 = 0.04.
    assert np.isclose(float(math3.schlick(1.5, 1.0)), 0.04, atol=1e-6)
    # Grazing: probability -> 1.
    assert np.isclose(float(math3.schlick(1.5, 0.0)), 1.0, atol=1e-6)


def test_mix_unclamped():
    x = jnp.ones(3)
    y = jnp.array([0.5, 0.7, 1.0])
    out = math3.mix(x, y, 1.5)  # t in [0.5, 1.5] under quirk Q6
    expect = np.asarray(x) * (1 - 1.5) + np.asarray(y) * 1.5
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)
