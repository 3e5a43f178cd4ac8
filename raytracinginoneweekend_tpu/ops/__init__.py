from . import integrate, intersect, math3, postprocess, rng, scatter  # noqa: F401
