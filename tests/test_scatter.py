import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import TraceOptions
from raytracinginoneweekend_tpu.models.scene import (DIELECTRIC, LAMBERT,
                                                     METAL)
from raytracinginoneweekend_tpu.ops.scatter import scatter

OPT = TraceOptions()


def _one(direction, normal, mtype, albedo=(1, 1, 1), fuzz=0.0, ior=1.5,
         rand_vec=(0, 0, 0), ru=0.5, options=OPT):
    nd, alb, valid = scatter(
        jnp.asarray([direction], jnp.float32),
        jnp.asarray([normal], jnp.float32),
        jnp.asarray([mtype], jnp.int32),
        jnp.asarray([albedo], jnp.float32),
        jnp.asarray([fuzz], jnp.float32),
        jnp.asarray([ior], jnp.float32),
        jnp.asarray([rand_vec], jnp.float32),
        jnp.asarray([ru], jnp.float32),
        options)
    return np.asarray(nd[0]), np.asarray(alb[0]), bool(valid[0])


def test_lambert_direction():
    rv = (0.1, 0.2, 0.3)
    nd, alb, valid = _one((0, -1, 0), (0, 1, 0), LAMBERT, albedo=(0.5, 0.6, 0.7),
                          rand_vec=rv)
    np.testing.assert_allclose(nd, np.array([0, 1, 0]) + np.array(rv),
                               rtol=1e-6)
    np.testing.assert_allclose(alb, [0.5, 0.6, 0.7])
    assert valid


def test_metal_mirror_and_fuzz():
    i = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    rv = (0.0, 0.1, 0.0)
    nd, _, valid = _one(tuple(i * 5), (0, 1, 0), METAL, fuzz=0.5, rand_vec=rv)
    expect = np.array([1.0, 1.0, 0.0]) / np.sqrt(2) + 0.5 * np.array(rv)
    np.testing.assert_allclose(nd, expect, atol=1e-6)
    assert valid


def test_metal_absorbed_below_surface():
    # Fuzz pushes the scattered ray below the surface -> invalid
    # (raytracer.hxx:152-155; cuda_impl.cu:225-228).
    i = np.array([1.0, -0.01, 0.0])
    nd, _, valid = _one(tuple(i), (0, 1, 0), METAL, fuzz=3.0,
                        rand_vec=(0, -1, 0))
    assert not valid


def test_dielectric_refracts_head_on():
    # Head-on: Schlick prob = 0.04; ru = 0.5 >= prob -> refract straight.
    nd, _, valid = _one((0, -1, 0), (0, 1, 0), DIELECTRIC, ru=0.5)
    assert valid
    np.testing.assert_allclose(nd, [0, -1, 0], atol=1e-5)


def test_dielectric_reflects_when_rr_below_prob():
    # ru = 0.01 < 0.04 -> reflect.
    nd, _, valid = _one((0, -1, 0), (0, 1, 0), DIELECTRIC, ru=0.01)
    assert valid
    np.testing.assert_allclose(nd, [0, 1, 0], atol=1e-5)


def test_dielectric_tir_always_reflects():
    # Grazing exit from inside glass: TIR, reflection forced regardless of ru.
    i = np.array([1.0, 0.05, 0.0])
    i = i / np.linalg.norm(i)
    nd, _, valid = _one(tuple(i), (0, 1, 0), DIELECTRIC, ru=0.999)
    assert valid
    expect = i - 2 * np.dot(i, [0, 1, 0]) * np.array([0, 1, 0.0])
    np.testing.assert_allclose(nd, expect, atol=1e-5)
    assert np.all(np.isfinite(nd))
